#!/usr/bin/env python
"""Measure sustained matmul rate for bf16 vs s8xs8->s32 on this chip.

Decides whether the int8 eval path can beat bf16 at all: v5e datasheet says
2x, but the relay/libtpu combo must actually lower s8 dots to the MXU.
Device-side chained scan + two-point slope (same method as bench.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp

N = 4096
ITERS = 24


def rate(dtype, acc):
    x = (jnp.ones((N, N)) * 0.01).astype(dtype)
    w = (jnp.ones((N, N)) * 0.01).astype(dtype)

    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(n, x, w):
        def body(c, _):
            y = jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())), preferred_element_type=acc
            )
            return y.astype(dtype), None

        out, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    float(chain(2, x, w))
    float(chain(ITERS, x, w))
    t0 = time.time()
    float(chain(2, x, w))
    t_short = time.time() - t0
    t0 = time.time()
    float(chain(ITERS, x, w))
    t_long = time.time() - t0
    dt = (t_long - t_short) / (ITERS - 2)
    return 2 * N**3 / dt / 1e12


print(f"bf16: {rate(jnp.bfloat16, jnp.float32):.1f} TFLOP/s", flush=True)
print(f"int8: {rate(jnp.int8, jnp.int32):.1f} TOP/s", flush=True)
