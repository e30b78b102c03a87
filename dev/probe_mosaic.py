#!/usr/bin/env python
"""Probe Mosaic lowering support for the layout patterns the DSCF rows
kernels need.  Each probe compiles a tiny kernel on the real TPU and
prints OK/FAIL — so kernel design decisions rest on facts, not guesses.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, JC = 16, 128, 8


def probe(name, fn):
    try:
        out = jax.jit(fn)()
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


# 1. leading-dims transpose (jc, h, w) -> (h, jc, w)
def k_transpose(x_ref, o_ref):
    o_ref[...] = x_ref[...].transpose(1, 0, 2)


probe(
    "transpose(1,0,2)",
    lambda: pl.pallas_call(
        k_transpose,
        out_shape=jax.ShapeDtypeStruct((H, JC, W), jnp.float32),
    )(jnp.ones((JC, H, W), jnp.float32)),
)


# 2. strided middle-dim store: o[:, j, :] = (h, w)
def k_store(x_ref, o_ref):
    for j in range(JC):
        o_ref[:, j, :] = x_ref[...] * j


probe(
    "store o[:, j, :]",
    lambda: pl.pallas_call(
        k_store,
        out_shape=jax.ShapeDtypeStruct((H, JC, W), jnp.float32),
    )(jnp.ones((H, W), jnp.float32)),
)


# 3. strided middle-dim load: x[:, j, :]
def k_load(x_ref, o_ref):
    acc = jnp.zeros((H, W), jnp.float32)
    for j in range(JC):
        acc = acc + x_ref[:, j, :]
    o_ref[...] = acc


probe(
    "load x[:, j, :]",
    lambda: pl.pallas_call(
        k_load,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
    )(jnp.ones((H, JC, W), jnp.float32)),
)


# 4. batched dot_general with batch dim 0: (jc,h,s)x(jc,w,s) -> (jc,h,w)
def k_bdot(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...],
        b_ref[...],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


probe(
    "batched dot (jc,h,s)x(jc,w,s)",
    lambda: pl.pallas_call(
        k_bdot,
        out_shape=jax.ShapeDtypeStruct((JC, H, W), jnp.float32),
    )(
        jnp.ones((JC, H, 24), jnp.float32),
        jnp.ones((JC, W, 24), jnp.float32),
    ),
)


# 5. non-batched dot with 3-D lhs: (jc,s2,w) contract s2 with (s1,s2)
def k_dot3(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...],
        b_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


probe(
    "dot (jc,s2,w)x(s1,s2)->(jc,w,s1)",
    lambda: pl.pallas_call(
        k_dot3,
        out_shape=jax.ShapeDtypeStruct((JC, W, 24), jnp.float32),
    )(
        jnp.ones((JC, 32, W), jnp.float32),
        jnp.ones((24, 32), jnp.float32),
    ),
)


# 6. lane-column vector from a (jc, 2) block + broadcast into (jc, h, s1)
def k_bcast(p_ref, o_ref):
    by = 0.5 - 0.5 * p_ref[:, 0:1]  # (jc, 1)
    s3 = jax.lax.broadcasted_iota(jnp.int32, (JC, H, 24), 2).astype(
        jnp.float32
    )
    o_ref[...] = jnp.maximum(0.0, 1.0 - jnp.abs(by[:, :, None] - s3))


probe(
    "pos column broadcast (jc,1)->(jc,h,s1)",
    lambda: pl.pallas_call(
        k_bcast,
        out_shape=jax.ShapeDtypeStruct((JC, H, 24), jnp.float32),
    )(jnp.ones((JC, 2), jnp.float32)),
)
