#!/usr/bin/env python
"""Probe: does an s8 x s8 -> s32 dot lower and run fast INSIDE a Pallas
kernel on this TPU?  Decides whether the fused v4/tail kernels can take the
int8 MXU path (2x bf16 rate on v5e) instead of int8 being XLA-only.

Times a chained kernel that mimics the tail FFN shape at stage 2:
(1024, 512) @ (512, 2048) @ (2048, 512) per grid step, bf16 vs w8a8.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, C, H = 1024, 512, 2048
STEPS = 8
ITERS = 16


def _bf16_kernel(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    o_ref[...] = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _int8_kernel(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, o_ref):
    # dynamic per-row activation quant in VMEM + s8 dots
    x = x_ref[...].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-6) / 127.0
    xq = jnp.round(x / sx).astype(jnp.int8)
    h32 = jax.lax.dot_general(
        xq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = h32.astype(jnp.float32) * sx * s1_ref[...].astype(jnp.float32)
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True), 1e-6) / 127.0
    hq = jnp.round(h / sh).astype(jnp.int8)
    o32 = jax.lax.dot_general(
        hq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (
        o32.astype(jnp.float32) * sh * s2_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


def run(name, kernel, args_builder):
    try:
        operands = args_builder()

        def one(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M * STEPS, C), jnp.bfloat16),
                grid=(STEPS,),
                in_specs=[
                    pl.BlockSpec((M, C), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    *[
                        pl.BlockSpec(t.shape, (lambda nd: lambda i: (0,) * nd)(t.ndim),
                                     memory_space=pltpu.VMEM)
                        for t in operands
                    ],
                ],
                out_specs=pl.BlockSpec((M, C), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(x, *operands)

        x0 = jax.random.normal(
            jax.random.PRNGKey(0), (M * STEPS, C), jnp.bfloat16
        )

        @functools.partial(jax.jit, static_argnums=(0,))
        def many(n, x):
            def body(carry, _):
                xc, _ = carry
                y = one(xc)
                s = jnp.sum(y).astype(jnp.float32)
                return (x0 + (s * 0.0).astype(xc.dtype), s), None

            (_, s), _ = jax.lax.scan(body, (x, jnp.float32(0)), None, length=n)
            return s

        float(many(2, x0))
        float(many(ITERS, x0))
        t0 = time.time(); float(many(2, x0)); ts = time.time() - t0
        t0 = time.time(); float(many(ITERS, x0)); tl = time.time() - t0
        ms = 1000.0 * (tl - ts) / (ITERS - 2)
        gf = 2 * M * STEPS * (C * H + H * C) / 1e9
        print(json.dumps({"probe": name, "ms": round(ms, 3),
                          "tflops": round(gf / ms, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name,
                          "error": f"{type(e).__name__}: {str(e)[:300]}"}),
              flush=True)


if __name__ == "__main__":
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    w1f = jax.random.normal(k1, (C, H), jnp.float32) * 0.02
    w2f = jax.random.normal(k2, (H, C), jnp.float32) * 0.02

    run("bf16", _bf16_kernel,
        lambda: (w1f.astype(jnp.bfloat16), w2f.astype(jnp.bfloat16)))

    def int8_args():
        s1 = jnp.max(jnp.abs(w1f), axis=0, keepdims=True) / 127.0
        w1q = jnp.round(w1f / s1).astype(jnp.int8)
        s2 = jnp.max(jnp.abs(w2f), axis=0, keepdims=True) / 127.0
        w2q = jnp.round(w2f / s2).astype(jnp.int8)
        return (w1q, s1, w2q, s2)

    run("w8a8", _int8_kernel, int8_args)
