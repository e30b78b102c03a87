#!/usr/bin/env python
"""Per-level DSCF impl sweep on TPU (profile-guided, 2026-08-18).

The forward profile (dev/probe_profile_forward.py) shows the rows-layout
DSCF kernels are lane-wasteful at the small levels: L3 rpe builder
[64,2,15,600,20] costs 2.9 ms/forward (w=20 of 128 lanes used) and L3
attention 1.2 ms; L2 (w=40) ~1.9 ms combined.  This times the r5-packed
config with L3 (and L2+L3) flipped to the XLA einsum path, one process.
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

os.environ["IR_ADS_SWIN_ATTN"] = "pallas4,pallas4,pallas6,pallas6"
os.environ["IR_ADS_FFN"] = "fused"
os.environ["IR_ADS_SWIN_PACKED"] = "1"
os.environ["IR_ADS_DSCF_PACKED"] = "1,1,1,0"

from ir_ads_tpu.models.cmnext import CMNeXt  # noqa: E402

model = CMNeXt(
    backbone="SwinTransformer-B", num_classes=40, dtype=jnp.bfloat16,
    mmst_mask=False,
)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
rgb = jax.random.normal(k1, (8, 480, 640, 3), jnp.bfloat16)
dte = jax.random.normal(k2, (8, 480, 640, 3), jnp.bfloat16)
variables = jax.jit(
    lambda: model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
)()
jax.block_until_ready(variables)

CONFIGS = [
    ("L3xla", {"IR_ADS_DSCF_ATTN": "pallas3,pallas3,pallas3,xla"}),
    ("L23xla", {"IR_ADS_DSCF_ATTN": "pallas3,pallas3,xla,xla"}),
]

for tag, env in CONFIGS:
    for k, v in env.items():
        os.environ[k] = v
    try:
        @functools.partial(jax.jit, static_argnums=(0,))
        def many(n, v, r, d, _tag=tag):
            def body(carry, _):
                r, d, _ = carry
                out = model.apply(v, r, d, train=False)[0]
                s = jnp.sum(out).astype(jnp.float32)
                z = (s * 0.0).astype(r.dtype)
                return (rgb + z, dte + z, s), None

            (_, _, s_last), _ = jax.lax.scan(
                body, (r, d, jnp.float32(0)), None, length=n
            )
            return s_last

        t0 = time.time()
        float(many(2, variables, rgb, dte))
        compile_s = time.time() - t0
        float(many(10, variables, rgb, dte))
        t0 = time.time()
        float(many(2, variables, rgb, dte))
        ts = time.time() - t0
        t0 = time.time()
        float(many(10, variables, rgb, dte))
        tl = time.time() - t0
        print(json.dumps({
            "config": tag,
            "forward_ms": round(1000.0 * (tl - ts) / 8, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "config": tag, "error": f"{type(e).__name__}: {str(e)[:300]}"
        }), flush=True)
    finally:
        for k in env:
            os.environ.pop(k, None)
print("LEVELS_DONE", flush=True)
