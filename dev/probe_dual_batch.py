#!/usr/bin/env python
"""Dual-batch timing: both modality streams through each stage in ONE pass.

The forward profile shows stage 2 as TWO sequential 9-iteration scans (one
per stream) with per-iteration bias gathers and weight-slice copies; the
shared-weight streams can batch into one B=16 scan (SwinTransformer
dual_batch=True — numerics identical, the adapter branch stays
per-modality).  Measures r5-packed + best DSCF level config, dual on/off.
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
os.environ["IR_ADS_DSCF_ATTN"] = sys.argv[1] if len(sys.argv) > 1 else (
    "pallas3,pallas3,pallas3,xla"
)

from ir_ads_tpu.models.cmnext import CMNeXt  # noqa: E402

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
rgb = jax.random.normal(k1, (8, 480, 640, 3), jnp.bfloat16)
dte = jax.random.normal(k2, (8, 480, 640, 3), jnp.bfloat16)

for tag, kwargs in (
    ("dual", dict(dual_batch=True)),
    ("twopass", None),
):
    model = CMNeXt(
        backbone="SwinTransformer-B", num_classes=40, dtype=jnp.bfloat16,
        mmst_mask=False, backbone_kwargs=kwargs,
    )
    variables = jax.jit(
        lambda m=model: m.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    )()
    jax.block_until_ready(variables)
    try:
        @functools.partial(jax.jit, static_argnums=(0,))
        def many(n, v, r, d, _m=model):
            def body(carry, _):
                r, d, _ = carry
                out = _m.apply(v, r, d, train=False)[0]
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
print("DUAL_DONE", flush=True)
