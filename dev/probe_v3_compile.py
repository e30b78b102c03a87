#!/usr/bin/env python
"""Compile-time + runtime probe for the v3 map-layout window-attention
kernel at bench stage shapes, vs the v2 kernel + XLA partition/reverse.

v3 folds window partition/reverse into the kernel (VMEM relayout) but was
parked because large bands sent Mosaic into multi-minute compiles at
stage-0 480p shapes.  This probe measures, per stage and per band size:
  - wall compile time of the kernel alone
  - steady-state runtime (chained-scan slope; the relay lies otherwise)
so the band-size knob (IR_ADS_SWIN_V3_ROWS) can be set from data.

Usage: python dev/probe_v3_compile.py [rows ...]   (default: 1 2 5)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ir_ads_tpu.ops.pallas_swin import (
    fused_window_attention_qkv,
    pallas_window_attention_map,
    pallas_window_block,
    shift_region_ids,
)
from ir_ads_tpu.ops.window_attention import (
    window_partition,
    window_reverse,
)

WS = 12
# bench stage shapes at 480x640 flip-batch-8 (Hp, Wp padded to ws=12):
# (B, Hp, Wp, C, heads)
STAGES = [
    (8, 120, 168, 128, 4),
    (8, 60, 84, 256, 8),
    (8, 36, 48, 512, 16),
    (8, 24, 24, 1024, 32),
]


def timed_slope(fn, x, iters=(5, 25)):
    """Two-point chained-iteration slope (device-side scan): runtime per
    call = (t_long - t_short) / (long - short).  The chained data dep
    defeats both relay early-returns and XLA DCE."""

    def chain(x, iters):
        def body(x, _):
            out = fn(x)
            return x * (1.0 + jnp.sum(out).astype(x.dtype) * 1e-12), ()

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(y)

    short, long_ = iters
    c_s = jax.jit(chain, static_argnums=1).lower(x, short).compile()
    c_l = jax.jit(chain, static_argnums=1).lower(x, long_).compile()
    float(c_s(x))  # warm
    t0 = time.time()
    float(c_l(x))
    t1 = time.time()
    float(c_s(x))
    t2 = time.time()
    return ((t1 - t0) - (t2 - t1)) / (long_ - short)


def main():
    rows_list = [int(a) for a in sys.argv[1:]] or [1, 2, 5]
    for si, (b, hp, wp, c, heads) in enumerate(STAGES):
        n = WS * WS
        scale = (c // heads) ** -0.5
        key = jax.random.PRNGKey(si)
        qkv = jax.random.normal(key, (b, hp, wp, 3 * c), jnp.bfloat16)
        bias = jax.random.normal(key, (heads, n, n), jnp.float32)
        region = jnp.asarray(shift_region_ids(hp, wp, WS, WS // 2))

        # v2 baseline: partition -> kernel -> reverse
        def v2(qkv):
            wins = window_partition(qkv, WS)
            out = fused_window_attention_qkv(wins, bias, region, scale, heads)
            return window_reverse(out, WS, hp, wp)

        t0 = time.time()
        dt_v2 = timed_slope(v2, qkv)
        print(
            f"stage{si} v2+layout: {dt_v2*1e3:8.3f} ms/call "
            f"(compile+run {time.time()-t0:.0f}s)",
            flush=True,
        )

        for rows in rows_list:
            nwin_h = hp // WS
            rps = max(
                cd for cd in range(1, nwin_h + 1)
                if nwin_h % cd == 0 and cd <= rows
            )

            def v3(qkv):
                return pallas_window_attention_map(
                    qkv, bias, region, scale, heads, WS, rows_per_step=rps
                )

            t0 = time.time()
            try:
                dt_v3 = timed_slope(v3, qkv)
                print(
                    f"stage{si} v3 rows={rps}: {dt_v3*1e3:8.3f} ms/call "
                    f"(compile+run {time.time()-t0:.0f}s)",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"stage{si} v3 rows={rps}: FAIL {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:120]}",
                    flush=True,
                )

        # v4 whole half-block (LN1+qkv+attn+proj+residual); x map input.
        x = jax.random.normal(key, (b, hp, wp, c), jnp.bfloat16)
        lnp = (
            jnp.ones((c,), jnp.float32),
            jnp.zeros((c,), jnp.float32),
        )
        wq = jax.random.normal(key, (c, 3 * c), jnp.bfloat16) * 0.05
        bq = jnp.zeros((3 * c,), jnp.float32)
        wpj = jax.random.normal(key, (c, c), jnp.bfloat16) * 0.05
        bpj = jnp.zeros((c,), jnp.float32)
        for rows in rows_list:
            nwin_h = hp // WS
            rps = max(
                cd for cd in range(1, nwin_h + 1)
                if nwin_h % cd == 0 and cd <= rows
            )

            def v4(x):
                return pallas_window_block(
                    x, *lnp, wq, bq, wpj, bpj, bias, region, scale, heads,
                    WS, shift=WS // 2, rows_per_step=rps,
                )

            t0 = time.time()
            try:
                dt_v4 = timed_slope(v4, x)
                print(
                    f"stage{si} v4 rows={rps}: {dt_v4*1e3:8.3f} ms/call "
                    f"(compile+run {time.time()-t0:.0f}s)",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"stage{si} v4 rows={rps}: FAIL {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:120]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
