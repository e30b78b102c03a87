#!/usr/bin/env python
"""Time the v4 fused window-block kernel packed-heads vs per-head at each
Swin-B stage shape (B=8 480x640 bench geometry), on the real TPU.

Chained-scan slope timing (see bench.py notes: block_until_ready lies
through the relay).  Prints one JSON line per (stage, packed).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

import jax
import jax.numpy as jnp

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

B = 8
WS = 12
# (Hp, Wp, C, heads) per stage at 480x640 (padded to window multiples)
STAGES = [
    (120, 168, 128, 4),
    (60, 84, 256, 8),
    (36, 48, 512, 16),
    (24, 24, 1024, 32),
]
ITERS = 16


def time_stage(hp, wp, c, heads, packed):
    os.environ["IR_ADS_SWIN_PACKED"] = "1" if packed else "0"
    from ir_ads_tpu.ops.pallas_swin import pallas_window_block

    n = WS * WS
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, hp, wp, c), jnp.bfloat16)
    ln_s = jnp.ones((c,), jnp.float32)
    ln_b = jnp.zeros((c,), jnp.float32)
    wqkv = jax.random.normal(ks[1], (c, 3 * c), jnp.bfloat16) * 0.02
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jax.random.normal(ks[2], (c, c), jnp.bfloat16) * 0.02
    bproj = jnp.zeros((c,), jnp.float32)
    bias = jax.random.normal(ks[3], (heads, n, n), jnp.float32)

    @functools.partial(jax.jit, static_argnums=(0,))
    def many(nit, x0):
        def body(carry, _):
            xc, _ = carry
            y = pallas_window_block(
                xc, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias, None,
                (c // heads) ** -0.5, heads, WS,
            )
            s = jnp.sum(y).astype(jnp.float32)
            return (x + (s * 0.0).astype(xc.dtype), s), None

        (_, s_last), _ = jax.lax.scan(body, (x0, jnp.float32(0)), None, length=nit)
        return s_last

    try:
        float(many(2, x))
        float(many(ITERS, x))
        t0 = time.time()
        float(many(2, x))
        t_s = time.time() - t0
        t0 = time.time()
        float(many(ITERS, x))
        t_l = time.time() - t0
        ms = 1000.0 * (t_l - t_s) / (ITERS - 2)
        print(
            json.dumps(
                {"stage": f"{hp}x{wp}x{c}h{heads}", "packed": packed,
                 "block_ms": round(ms, 3)}
            ),
            flush=True,
        )
    except Exception as e:
        print(
            json.dumps(
                {"stage": f"{hp}x{wp}x{c}h{heads}", "packed": packed,
                 "error": f"{type(e).__name__}: {str(e)[:160]}"}
            ),
            flush=True,
        )


if __name__ == "__main__":
    for hp, wp, c, heads in STAGES:
        for packed in (False, True):
            time_stage(hp, wp, c, heads, packed)
