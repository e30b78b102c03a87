#!/usr/bin/env python
"""Isolate the v4 half-block kernel's cost structure at stage-0 shapes.

The forward profile shows each stage-0 v4 call ([8,120,168,128]) at
~1.74 ms vs a ~0.25 ms traffic+MXU bound.  This times kernel VARIANTS on
the bare stage-0 shape to attribute the gap: full kernel, no-softmax
(scores straight to PV), no-mask (skip the region where), unpacked heads,
and a qkv+proj-only skeleton.  Chained-scan timing (data dependency), one
process.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.ops import pallas_swin as psw
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

B, H, W, C = 8, 120, 160, 128
WS, HEADS = 12, 4
SHIFT = 6
HP = -(-H // WS) * WS   # 120
WP = -(-W // WS) * WS   # 168
N = WS * WS
SCALE = (C // HEADS) ** -0.5

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, HP, WP, C)), jnp.bfloat16)
ln_s = jnp.ones((C,), jnp.float32)
ln_b = jnp.zeros((C,), jnp.float32)
wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)
bqkv = jnp.zeros((3 * C,), jnp.float32)
wp_ = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
bp_ = jnp.zeros((C,), jnp.float32)
bias = jnp.asarray(rng.standard_normal((HEADS, N, N)) * 0.02, jnp.float32)
region = jnp.asarray(psw.shift_region_ids(HP, WP, WS, SHIFT))


def time_fn(tag, fn, *args):
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, xx):
        def body(carry, _):
            xc, _ = carry
            out = fn(xc, *args)
            s = jnp.sum(out).astype(jnp.float32)
            z = (s * 0.0).astype(xc.dtype)
            return (x + z, s), None

        (_, s_last), _ = jax.lax.scan(body, (xx, jnp.float32(0)), None,
                                      length=n)
        return s_last

    try:
        t0 = time.time()
        float(many(2, x))
        compile_s = time.time() - t0
        float(many(18, x))
        t0 = time.time()
        float(many(2, x))
        ts = time.time() - t0
        t0 = time.time()
        float(many(18, x))
        tl = time.time() - t0
        # per-call ms (one kernel call per iteration)
        print(json.dumps({
            "variant": tag,
            "call_ms": round(1000.0 * (tl - ts) / 16, 3),
            "compile_s": round(compile_s, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "variant": tag, "error": f"{type(e).__name__}: {str(e)[:200]}"
        }), flush=True)


def run(tag, **env):
    for k, v in env.items():
        os.environ[k] = v
    time_fn(
        tag,
        lambda xx: psw.fused_window_block(
            xx, ln_s, ln_b, wqkv, bqkv, wp_, bp_, bias, region,
            SCALE, HEADS, WS, H, W, SHIFT,
        ),
    )
    for k in env:
        os.environ.pop(k, None)


run("full_packed", IR_ADS_SWIN_PACKED="1")
run("full_unpacked", IR_ADS_SWIN_PACKED="0")
for rows in ("1", "2", "5"):
    run(f"packed_rows{rows}", IR_ADS_SWIN_PACKED="1",
        IR_ADS_SWIN_V4_ROWS=rows)
print("V4COST_DONE", flush=True)
