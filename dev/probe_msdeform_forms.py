#!/usr/bin/env python
"""Round-4: multi-scale deformable attention gather formulations on TPU.

BENCH_r03 measured DINO-R50 2000q at 800x1216 = 699.9 ms/forward, blamed on
MSDeformAttn's XLA per-pixel gathers (VERDICT r3 missing #1).  Before
writing the Pallas kernel, itemize WHERE the time goes and how each gather
formulation lowers:

  whole        the production ms_deform_attn at encoder shapes
  take1        ONE level-0 corner gather via take_along_axis (current form)
  gatherB      same gather via explicit lax.gather with batching dims
  flat         same gather on a flattened (BH*HW, C) operand, jnp.take axis=0
  onehot       same sampling as hat-weight one-hot matmul (small levels only)
  pallas_take  jnp.take on a VMEM-resident value inside a Pallas kernel
               (does Mosaic vectorize sublane gathers at all?)

Encoder shapes (the dominant cost): B=1, heads=8, D=32, levels
(100,152),(50,76),(25,38),(13,19), Lq = sum(HW) = 20197, P=4.
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

from ir_ads_tpu.detection.msdeform_attn import ms_deform_attn_xla
from ir_ads_tpu.ops.pallas_msdeform import ms_deform_attn_pallas
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

SHAPES = [(100, 152), (50, 76), (25, 38), (13, 19)]
LQ = sum(h * w for h, w in SHAPES)
B, HEADS, D, P, LV = 1, 8, 32, 4, 4
rng = np.random.default_rng(0)


def timeit(tag, fn, *args, long=16):
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, *a):
        # thread EVERY array arg through the carry: loop-invariant inputs
        # let XLA hoist the whole body out of the scan (the first run of
        # this probe measured -0.04 "ms" on a 461 s-to-compile graph)
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
        float(many(2, *args))
        compile_s = time.time() - t0
        float(many(long, *args))
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
                          "compile_s": round(compile_s, 1)}), flush=True)
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
    """One level / one corner worth of gather work."""
    v = jnp.asarray(
        rng.standard_normal((B * HEADS, h * w, D)) * 0.1, jnp.bfloat16)
    idx = jnp.asarray(
        rng.integers(0, h * w, (B * HEADS, lq * P)), jnp.int32)
    return v, idx


def f_take(v, idx):
    return jnp.take_along_axis(v, idx[..., None], axis=1)


def f_gatherB(v, idx):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        v, idx[..., None], dn, slice_sizes=(1, 1, D),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def f_flat(v, idx):
    g, hw, d = v.shape
    flat = v.reshape(g * hw, d)
    gidx = idx + (jnp.arange(g, dtype=jnp.int32) * hw)[:, None]
    return jnp.take(flat, gidx.reshape(-1), axis=0).reshape(g, -1, d)


def f_onehot(v, idx):
    g, hw, d = v.shape
    oh = jax.nn.one_hot(idx, hw, dtype=v.dtype)  # (G, LqP, HW)
    return jax.lax.dot_general(
        oh, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(v.dtype)


def pallas_take(v, idx):
    """Whole value in VMEM; take along the sublane dim inside the kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, hw, d = v.shape
    nq = idx.shape[1]

    def kern(v_ref, i_ref, o_ref):
        o_ref[0] = jnp.take(v_ref[0], i_ref[0], axis=0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((g, nq, d), v.dtype),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, hw, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(v, idx)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "whole"):
        # production op at encoder scale (Lq = sum HW) and decoder (Lq=2000)
        for lq, tag in ((LQ, "enc"), (2000, "dec")):
            value, locs, wgt = make_inputs(lq)
            timeit(f"whole_{tag}_lq{lq}",
                   lambda v, l, w: ms_deform_attn_xla(v, SHAPES, l, w),
                   value, locs, wgt, long=8 if lq > 4000 else 16)
    if which in ("all", "kernel"):
        # round-4 Pallas dynamic-gather kernel (ops/pallas_msdeform.py)
        for lq, tag in ((LQ, "enc"), (2000, "dec")):
            value, locs, wgt = make_inputs(lq)
            timeit(f"pallas_kernel_{tag}_lq{lq}",
                   lambda v, l, w: ms_deform_attn_pallas(v, SHAPES, l, w),
                   value, locs, wgt, long=16)
    if which in ("all", "corner"):
        h, w = SHAPES[0]
        v, idx = corner_inputs(h, w, LQ)
        timeit("take1_L0_encQ", f_take, v, idx)
        timeit("gatherB_L0_encQ", f_gatherB, v, idx)
        timeit("flat_L0_encQ", f_flat, v, idx)
        h3, w3 = SHAPES[2]
        v3, idx3 = corner_inputs(h3, w3, LQ)
        timeit("take1_L2_encQ", f_take, v3, idx3)
        timeit("onehot_L2_encQ", f_onehot, v3, idx3)
    if which in ("all", "pallas"):
        h, w = SHAPES[0]
        v, idx = corner_inputs(h, w, LQ)
        timeit("pallas_take_L0_encQ", pallas_take, v, idx)
    print("MSDEFORM_FORMS_DONE", flush=True)
