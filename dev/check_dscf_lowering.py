#!/usr/bin/env python
"""Compile-check the pallas3 DSCF kernels at the headline-bench level shapes.

480x640 input -> DSCF levels (h, w, g) = (120,160,1) (60,80,2) (30,40,4)
(15,20,8); all share M=600, hg=2, gc=128.  Run on the real TPU: catches
Mosaic block-rule lowering failures in seconds instead of inside the
300-second whole-model bench compile.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from ir_ads_tpu.ops.pallas_dscf import pallas_dscf_attention_rows
from ir_ads_tpu.ops.pallas_dscf_rpe import dscf_rpe_bias_rows_pallas

B = 8
LEVELS = [(120, 160, 1), (60, 80, 2), (30, 40, 4), (15, 20, 8)]
M, HG, GC = 600, 2, 128

for h, w, g in LEVELS:
    bg = B * g
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (bg, M, 2), jnp.float32, -1.0, 1.0)
    table = jax.random.normal(key, (g, HG, 119, 159), jnp.float32)
    bias = jax.jit(
        lambda p, t: dscf_rpe_bias_rows_pallas(p, t, h, w, jnp.bfloat16)
    )(pos, table)
    bias.block_until_ready()
    t1 = time.time()
    q = jax.random.normal(key, (bg, h * w, GC), jnp.bfloat16)
    k = jax.random.normal(key, (bg, M, GC), jnp.bfloat16)
    out = jax.jit(
        lambda q, k, v, b: pallas_dscf_attention_rows(q, k, v, b, 0.125, HG)
    )(q, k, k, bias)
    out.block_until_ready()
    print(
        f"L({h}x{w}) g={g}: rpe {t1 - t0:.1f}s attn {time.time() - t1:.1f}s OK",
        flush=True,
    )
print("ALL LEVELS LOWER OK")
