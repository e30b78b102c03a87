#!/usr/bin/env python
"""Minimal tpu.dynamic_gather feasibility + throughput probe.

The full msdeform kernel crashed the remote compile helper (HTTP 500,
subprocess exit 1) on its first TPU attempt — isolate WHICH piece dies:

  g1   take_along_axis dim0 on (4096, 256) bf16, idx broadcast in-kernel
  g2   same at (20224, 256) — the DINO encoder shape
  g3   same but idx prepared OUTSIDE (no in-kernel lane_expand concat)
  g4   i32 operand instead of bf16
  g5   the real _gather_kernel at encoder shape but B=1, n_tiles=1
       (one tile: gather + weight + reduce)

Each prints compile_s + slope ms/call, or the exception.
Usage: python dev/probe_dyngather.py [g1,g2,...|all]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

rng = np.random.default_rng(0)
LONG = 16


def timeit(tag, fn, *args):
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, *a):
        def body(carry, _):
            cur, _ = carry
            s = jnp.sum(fn(*cur).astype(jnp.float32))
            z = s * 0.0
            new = tuple(x + z.astype(x.dtype) for x in a)
            return (new, s), None

        (_, s), _ = jax.lax.scan(body, (a, jnp.float32(0)), None, length=n)
        return s

    try:
        t0 = time.time()
        float(many(2, *args))
        compile_s = time.time() - t0
        float(many(LONG, *args))
        best = None
        for _ in range(3):
            t0 = time.time()
            float(many(2, *args))
            ts = time.time() - t0
            t0 = time.time()
            float(many(LONG, *args))
            tl = time.time() - t0
            ms = 1000.0 * (tl - ts) / (LONG - 2)
            best = ms if best is None else min(best, ms)
        print(json.dumps({"variant": tag, "ms": round(best, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag,
                          "error": f"{type(e).__name__}: {str(e)[:500]}"}),
              flush=True)


def gather_inkernel_expand(s_rows, lanes, dtype, d=32):
    v = jnp.asarray(rng.standard_normal((s_rows, lanes)), dtype)
    idx = jnp.asarray(rng.integers(0, s_rows, (s_rows, lanes // d)), jnp.int32)

    def kern(v_ref, i_ref, o_ref):
        vv = v_ref[...]
        ii = i_ref[...]
        parts = [
            jax.lax.broadcast_in_dim(ii[:, h : h + 1], (s_rows, d), (0, 1))
            for h in range(lanes // d)
        ]
        full = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)
        o_ref[...] = jnp.take_along_axis(vv, full, axis=0)

    return lambda vv, ii: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((s_rows, lanes), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(vv, ii), (v, idx)


def gather_pre_expanded(s_rows, lanes, dtype):
    v = jnp.asarray(rng.standard_normal((s_rows, lanes)), dtype)
    idx = jnp.asarray(rng.integers(0, s_rows, (s_rows, lanes)), jnp.int32)

    def kern(v_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(v_ref[...], i_ref[...], axis=0)

    return lambda vv, ii: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((s_rows, lanes), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(vv, ii), (v, idx)


def real_kernel_one_tile():
    from ir_ads_tpu.ops.pallas_msdeform import ms_deform_attn_pallas

    shapes = ((100, 152), (50, 76), (25, 38), (13, 19))
    s = sum(h * w for h, w in shapes)
    b, heads, d, p, lq = 1, 8, 32, 4, 316
    value = jnp.asarray(
        rng.standard_normal((b, s, heads, d)) * 0.1, jnp.bfloat16)
    loc = jnp.asarray(rng.random((b, lq, heads, len(shapes), p, 2)),
                      jnp.float32)
    w = jnp.asarray(rng.random((b, lq, heads, len(shapes), p)), jnp.bfloat16)
    return (
        lambda v, l, ww: ms_deform_attn_pallas(v, shapes, l, ww),
        (value, loc, w),
    )


if __name__ == "__main__":
    which = (sys.argv[1].split(",") if len(sys.argv) > 1 else ["all"])
    if "all" in which:
        which = ["g1", "g2", "g3", "g4", "g5"]
    if "g1" in which:
        fn, args = gather_inkernel_expand(4096, 256, jnp.bfloat16)
        timeit("g1_tala_4096x256_bf16", fn, *args)
    if "g2" in which:
        fn, args = gather_inkernel_expand(20224, 256, jnp.bfloat16)
        timeit("g2_tala_20224x256_bf16", fn, *args)
    if "g3" in which:
        fn, args = gather_pre_expanded(20224, 256, jnp.bfloat16)
        timeit("g3_preidx_20224x256_bf16", fn, *args)
    if "g4" in which:
        fn, args = gather_pre_expanded(4096, 256, jnp.int32)
        timeit("g4_preidx_4096x256_i32", fn, *args)
    if "g5" in which:
        fn, args = real_kernel_one_tile()
        timeit("g5_real_kernel_enc_1tile", fn, *args)
    print("DYNGATHER_DONE", flush=True)
