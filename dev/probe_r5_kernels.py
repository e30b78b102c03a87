#!/usr/bin/env python
"""Standalone real-TPU compile+run check of the round-5 kernels before
spending whole-model A/B slots: (a) v4 typed mask (BIASMASK=3) at stage-0
geometry, (b) v6 typed mask at stage-2 geometry, (c) the fused patch-embed
kernel at the production FLAT shape.  Interpret mode hid two Mosaic walls
already (scatter-add, dynamic_slice) — only a real compile counts.

Usage: python dev/probe_r5_kernels.py [a|b|c|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WHICH = sys.argv[1] if len(sys.argv) > 1 else "all"

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()


def timed(name, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        chk = float(jnp.sum(out.astype(jnp.float32)))
        print(json.dumps({
            "probe": name, "ok": True,
            "compile_s": round(time.time() - t0, 1),
            "checksum": round(chk, 3),
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "probe": name, "ok": False,
            "error": f"{type(e).__name__}: {str(e)[:400]}",
        }), flush=True)


if WHICH in ("a", "all"):
    os.environ["IR_ADS_SWIN_BIASMASK"] = "3"
    from ir_ads_tpu.ops.pallas_swin import (
        pallas_window_block, shift_region_ids,
    )

    rng = np.random.RandomState(0)
    c, heads, ws = 128, 4, 12
    hp, wp = 120, 168
    x = jnp.asarray(rng.randn(4, hp, wp, c).astype(np.float32)).astype(
        jnp.bfloat16
    )
    args = [
        jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05) for s in
        [(c,), (c,), (c, 3 * c), (3 * c,), (c, c), (c,),
         (heads, ws * ws, ws * ws)]
    ]
    region = jnp.asarray(shift_region_ids(hp, wp, ws, 6))
    timed("v4_typed_stage0", lambda: jax.jit(
        lambda x: pallas_window_block(
            x, *args, region, (c // heads) ** -0.5, heads, ws,
            120, 160, 6,
        )
    )(x))

if WHICH in ("b", "all"):
    os.environ["IR_ADS_SWIN_BIASMASK"] = "3"
    from ir_ads_tpu.ops.pallas_swin import (
        pallas_window_block_v6, shift_region_ids,
    )

    rng = np.random.RandomState(1)
    c, heads, ws = 512, 16, 12
    h, w = 30, 40
    hp, wp = 36, 48
    x = jnp.asarray(rng.randn(4, h, w, c).astype(np.float32)).astype(
        jnp.bfloat16
    )
    attn = tuple(
        jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05) for s in
        [(c,), (c,), (c, 3 * c), (3 * c,), (c, c), (c,),
         (heads, ws * ws, ws * ws)]
    )
    tail = tuple(
        jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05) for s in
        [(c,), (c,), (c, 4 * c), (4 * c,), (4 * c, c), (c,),
         (c, 32), (32,), (32, c), (c,)]
    )
    region = jnp.asarray(shift_region_ids(hp, wp, ws, 6))
    timed("v6_typed_stage2", lambda: jax.jit(
        lambda x: pallas_window_block_v6(
            x, attn, tail, region, (c // heads) ** -0.5, heads, ws, 6,
        )
    )(x))

if WHICH in ("c", "all"):
    from ir_ads_tpu.ops.pallas_patch import pallas_patch_embed

    rng = np.random.RandomState(2)
    x = jnp.asarray(
        rng.randn(8, 480, 640 * 3).astype(np.float32)
    ).astype(jnp.bfloat16)
    wk2 = jnp.asarray(rng.randn(48, 128).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(128).astype(np.float32) * 0.05)
    ls = jnp.ones((128,), jnp.float32)
    lb = jnp.zeros((128,), jnp.float32)
    timed("patch_embed_pallas", lambda: jax.jit(
        lambda x: pallas_patch_embed(x, wk2, bias, ls, lb, 4, 3)
    )(x))

if WHICH in ("d", "all"):
    # round-5 attention BACKWARD kernel at the stage-2 train geometry
    # (dual-batch 8, 36x48 plane, c=512/16 heads) and stage-0 (c=128)
    from ir_ads_tpu.ops.pallas_swin import (
        pallas_window_attention_bwd, shift_region_ids,
    )

    rng = np.random.RandomState(3)
    for tag, c, heads, nw_h, nw_w in (
        ("bwd_stage2", 512, 16, 3, 4),
        ("bwd_stage0", 128, 4, 10, 14),
    ):
        ws, b = 12, 8
        n = ws * ws
        bn = b * nw_h * nw_w
        qkvw = jnp.asarray(
            rng.randn(bn, n, 3 * c).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        dow = jnp.asarray(
            rng.randn(bn, n, c).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        bias = jnp.asarray(
            rng.randn(heads, n, n).astype(np.float32) * 0.05
        )
        region = jnp.asarray(
            shift_region_ids(nw_h * ws, nw_w * ws, ws, ws // 2)
        )
        scale = (c // heads) ** -0.5
        fn = jax.jit(
            lambda q, d, bi, r: pallas_window_attention_bwd(
                q, d, bi, r, scale, heads
            )
        )
        timed(tag, lambda: fn(qkvw, dow, bias, region)[0])
        # steady-state timing
        try:
            import time as _t

            jax.block_until_ready(fn(qkvw, dow, bias, region))
            t0 = _t.time()
            for _ in range(10):
                out = fn(qkvw, dow, bias, region)
            jax.block_until_ready(out)
            print(json.dumps({
                "probe": tag + "_ms",
                "value": round((_t.time() - t0) / 10 * 1000, 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": tag + "_ms", "error": str(e)[:200]}),
                  flush=True)

if WHICH in ("e",):
    # frozen-backbone (adapter-only) bwd kernel: no dbias / no ow
    from ir_ads_tpu.ops.pallas_swin import (
        pallas_window_attention_bwd, shift_region_ids,
    )

    rng = np.random.RandomState(3)
    for tag, c, heads, nw_h, nw_w in (
        ("bwd_frozen_stage2", 512, 16, 3, 4),
        ("bwd_frozen_stage0", 128, 4, 10, 14),
    ):
        ws, b = 12, 8
        n = ws * ws
        bn = b * nw_h * nw_w
        qkvw = jnp.asarray(
            rng.randn(bn, n, 3 * c).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        dow = jnp.asarray(
            rng.randn(bn, n, c).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        bias = jnp.asarray(
            rng.randn(heads, n, n).astype(np.float32) * 0.05
        )
        region = jnp.asarray(
            shift_region_ids(nw_h * ws, nw_w * ws, ws, ws // 2)
        )
        scale = (c // heads) ** -0.5
        fn = jax.jit(
            lambda q, d, bi, r: pallas_window_attention_bwd(
                q, d, bi, r, scale, heads,
                want_ow=False, want_dbias=False,
            )[0]
        )
        timed(tag, lambda: fn(qkvw, dow, bias, region))
        try:
            import time as _t

            jax.block_until_ready(fn(qkvw, dow, bias, region))
            t0 = _t.time()
            for _ in range(10):
                out = fn(qkvw, dow, bias, region)
            jax.block_until_ready(out)
            print(json.dumps({
                "probe": tag + "_ms",
                "value": round((_t.time() - t0) / 10 * 1000, 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": tag + "_ms", "error": str(e)[:200]}),
                  flush=True)

if WHICH in ("f",):
    # round-5 DSCF rows BACKWARD kernel at the bench level-0/1 geometry
    from ir_ads_tpu.ops.pallas_dscf import pallas_dscf_rows_bwd

    rng = np.random.RandomState(5)
    for tag, bg, h, w, gc, hg, m in (
        ("dscf_bwd_L0", 8, 120, 160, 16, 2, 304),
        ("dscf_bwd_L1", 8, 60, 80, 32, 4, 304),
    ):
        mp = (m + 7) // 8 * 8
        q = jnp.asarray(
            rng.randn(bg, h * w, gc).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)
        k = jnp.asarray(
            rng.randn(bg, mp, gc).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)
        v = jnp.asarray(
            rng.randn(bg, mp, gc).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)
        bias = jnp.asarray(
            rng.randn(bg, hg, h, m, w).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)
        g = jnp.asarray(
            rng.randn(bg, h * w, gc).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)
        fn = jax.jit(
            lambda a, b, c, d, e: pallas_dscf_rows_bwd(
                a, b, c, d, e, 0.25, hg
            )[0]
        )
        timed(tag, lambda: fn(q, k, v, bias, g))
        try:
            import time as _t

            jax.block_until_ready(fn(q, k, v, bias, g))
            t0 = _t.time()
            for _ in range(10):
                out = fn(q, k, v, bias, g)
            jax.block_until_ready(out)
            print(json.dumps({
                "probe": tag + "_ms",
                "value": round((_t.time() - t0) / 10 * 1000, 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": tag + "_ms", "error": str(e)[:200]}),
                  flush=True)

print("R5KERNELS_DONE", flush=True)
