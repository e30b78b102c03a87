#!/usr/bin/env python
"""TPU timing for the packed-slot DSCF rows kernel (per-level gated).

Numerics were validated on-device 2026-08-18 (levels 0-2 max_abs_diff
0.0039 = one bf16 ulp; level 3's whole-plane tile crashes Mosaic, so the
call site gates packing per level — see DAttentionMM).  This probe measures
the in-context whole-model win: B=8 480x640 dual-stream forward under the
r5 bench config with IR_ADS_DSCF_PACKED=0, =1,1,1,0, and the int8 combo,
all in ONE process (tunnel startup ~2.5 min, compiles 60-250 s each).
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
os.environ["IR_ADS_DSCF_ATTN"] = "pallas3"
os.environ["IR_ADS_FFN"] = "fused"
os.environ["IR_ADS_SWIN_PACKED"] = "1"

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
    ("packed012", {"IR_ADS_DSCF_PACKED": "1,1,1,0"}),
    ("packed012_int8", {"IR_ADS_DSCF_PACKED": "1,1,1,0", "IR_ADS_INT8": "1"}),
    ("baseline", {"IR_ADS_DSCF_PACKED": "0"}),
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
print("PROBE_DONE", flush=True)
