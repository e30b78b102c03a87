#!/usr/bin/env python
"""Round-4 msdeform gather forms, take 2: one variant per process.

The all-in-one probe (probe_msdeform_forms.py) timed out through the relay:
with the hoist-proof harness, the encoder-scale whole-op compiles run many
minutes EACH, so one process serializes ~40 min of compiles before the
first number.  This probe runs ONE named variant per invocation (the shell
loop dev/run_msd2.sh gives each its own timeout) and prints one JSON line.

Variants (encoder shapes B=1 H=8 D=32, levels (100,152),(50,76),(25,38),
(13,19), Lq = sum HW = 20197 or decoder Lq = 2000, P=4):

  whole_{enc,dec}   production ms_deform_attn_xla (grid_sample per level)
  xla2_{enc,dec}    single take_along_axis on the level-concat stack
                    (detection/msdeform_attn.ms_deform_attn_xla2)
  take1_L0/L2       one corner gather via take_along_axis (micro)
  take4_L0          row-gather form: value as (S/4, 4*D=128 lanes), gather
                    full 128-lane rows at idx//4, select the D=32 sub-row
                    by one-hot(idx%4) — trades 4x fetch for lane-aligned
                    rows (is XLA's gather granularity the bottleneck?)
  onehot_L2/L3      sampling as one-hot x value MXU matmul (small levels)
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

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

SHAPES = [(100, 152), (50, 76), (25, 38), (13, 19)]
LQ = sum(h * w for h, w in SHAPES)
B, HEADS, D, P, LV = 1, 8, 32, 4, 4
rng = np.random.default_rng(0)


def timeit(tag, fn, *args, long=8):
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, *a):
        # thread EVERY array arg through the carry so nothing is
        # loop-invariant (else XLA hoists the body out of the scan)
        def body(carry, _):
            cur, _ = carry
            s = jnp.sum(fn(*cur)).astype(jnp.float32)
            z = s * 0.0
            new = tuple(x + z.astype(x.dtype) for x in a)
            return (new, s), None

        (_, s), _ = jax.lax.scan(body, (a, jnp.float32(0)), None, length=n)
        return s

    try:
        t0 = time.time()
        c2 = float(many(2, *args))
        compile_s = time.time() - t0
        print(json.dumps({"variant": tag, "phase": "compiled_short",
                          "s": round(compile_s, 1)}), flush=True)
        t0 = time.time()
        cl = float(many(long, *args))
        compile_l = time.time() - t0
        best = None
        for _ in range(3):
            t0 = time.time()
            float(many(2, *args))
            ts = time.time() - t0
            t0 = time.time()
            float(many(long, *args))
            tl = time.time() - t0
            ms = 1000.0 * (tl - ts) / (long - 2)
            best = ms if best is None else min(best, ms)
        print(json.dumps({"variant": tag, "ms": round(best, 3),
                          "compile_s": round(compile_s + compile_l, 1),
                          "checksum": round(c2, 2)}), flush=True)
        return best
    except Exception as e:
        print(json.dumps({"variant": tag,
                          "error": f"{type(e).__name__}: {str(e)[:300]}"}),
              flush=True)
        return None


def make_inputs(lq):
    value = jnp.asarray(
        rng.standard_normal((B, LQ, HEADS, D)) * 0.1, jnp.bfloat16)
    locs = jnp.asarray(rng.random((B, lq, HEADS, LV, P, 2)), jnp.float32)
    wgt = jnp.asarray(rng.random((B, lq, HEADS, LV, P)), jnp.bfloat16)
    wgt = wgt / jnp.sum(wgt, axis=(-1, -2), keepdims=True)
    return value, locs, wgt


def corner_inputs(h, w, lq):
    v = jnp.asarray(
        rng.standard_normal((B * HEADS, h * w, D)) * 0.1, jnp.bfloat16)
    idx = jnp.asarray(
        rng.integers(0, h * w, (B * HEADS, lq * P)), jnp.int32)
    return v, idx


def f_take(v, idx):
    return jnp.take_along_axis(v, idx[..., None], axis=1)


def f_take4(v, idx):
    g, hw, d = v.shape
    hw4 = -(-hw // 4) * 4
    if hw4 != hw:
        v = jnp.pad(v, [(0, 0), (0, hw4 - hw), (0, 0)])
    v4 = v.reshape(g, hw4 // 4, 4 * d)
    rows = jnp.take_along_axis(v4, (idx // 4)[..., None], axis=1)
    rows = rows.reshape(g, idx.shape[1], 4, d)
    sel = jax.nn.one_hot(idx % 4, 4, dtype=v.dtype)  # (G, N, 4)
    return jnp.einsum("gnkd,gnk->gnd", rows, sel,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def f_gslice2(v, idx):
    """Paired-corner slice gather: bilinear corners (y,x0),(y,x0+1) are
    flat-adjacent, so one lax.gather row with slice_sizes (1,2,D) fetches
    BOTH — half the gather rows of take1 (tests whether the gather is
    row-rate-bound or byte-bound)."""
    g, hw, d = v.shape
    v2 = jnp.pad(v, [(0, 0), (0, 1), (0, 0)])  # so idx+1 stays in bounds
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3),
        collapsed_slice_dims=(),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    out = jax.lax.gather(
        v2, idx[..., None], dn, slice_sizes=(1, 2, d),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return out  # (G, N, 2, D)


def f_gpatch(v4, yx):
    """2x2-patch slice gather: ONE gather row per (query, point) fetches
    all four bilinear corners (slice_sizes (1,2,2,D)) from the 2-D map
    layout.  If the gather engine is row-rate-bound, this is 4x fewer
    rows than per-corner take_along_axis for the same fetched data."""
    g, h, w, d = v4.shape
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        v4, yx, dn, slice_sizes=(1, 2, 2, d),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    # (G, N, 2, 2, D)


def f_onehot(v, idx):
    g, hw, d = v.shape
    oh = jax.nn.one_hot(idx, hw, dtype=v.dtype)  # (G, N, HW)
    return jax.lax.dot_general(
        oh, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(v.dtype)


if __name__ == "__main__":
    from ir_ads_tpu.detection.msdeform_attn import (
        ms_deform_attn_xla,
        ms_deform_attn_xla2,
    )

    from ir_ads_tpu.detection.msdeform_attn import (
        ms_deform_attn_xla3,
        ms_deform_attn_xla4,
    )

    which = sys.argv[1]
    if which.startswith(("whole", "xla2", "xla3", "xla4")):
        form, tag = which.split("_")
        lq = LQ if tag == "enc" else 2000
        value, locs, wgt = make_inputs(lq)
        fn = {
            "whole": ms_deform_attn_xla,
            "xla2": ms_deform_attn_xla2,
            "xla3": ms_deform_attn_xla3,
            "xla4": ms_deform_attn_xla4,
        }[form]
        timeit(which, lambda v, l, w: fn(v, SHAPES, l, w),
               value, locs, wgt, long=6 if lq > 4000 else 8)
    elif which.startswith("take1"):
        lvl = int(which[-1] if which[-1].isdigit() else which.split("L")[1])
        h, w = SHAPES[lvl]
        v, idx = corner_inputs(h, w, LQ)
        timeit(which, f_take, v, idx)
    elif which.startswith("gpatch"):
        lvl = int(which.split("L")[1])
        h, w = SHAPES[lvl]
        # N = Lq * P rows (vs 4x that for per-corner takes)
        v4 = jnp.asarray(
            rng.standard_normal((B * HEADS, h, w, D)) * 0.1, jnp.bfloat16)
        yx = jnp.stack(
            [jnp.asarray(rng.integers(0, h - 1, (B * HEADS, LQ * P)), jnp.int32),
             jnp.asarray(rng.integers(0, w - 1, (B * HEADS, LQ * P)), jnp.int32)],
            axis=-1)
        timeit(which, f_gpatch, v4, yx)
    elif which.startswith("gslice2"):
        lvl = int(which.split("L")[1])
        h, w = SHAPES[lvl]
        v, idx = corner_inputs(h, w, LQ)
        idx = idx // 2 * 2  # representative paired-corner starts
        timeit(which, f_gslice2, v, idx)
    elif which.startswith("take4"):
        lvl = int(which.split("L")[1])
        h, w = SHAPES[lvl]
        v, idx = corner_inputs(h, w, LQ)
        timeit(which, f_take4, v, idx)
    elif which.startswith("onehot"):
        lvl = int(which.split("L")[1])
        h, w = SHAPES[lvl]
        v, idx = corner_inputs(h, w, LQ)
        timeit(which, f_onehot, v, idx)
    else:
        raise SystemExit(f"unknown variant {which}")
    print("VARIANT_DONE", flush=True)
