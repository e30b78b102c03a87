#!/usr/bin/env python
"""Per-fusion TPU profile of the bench forward (r5 config).

jax.profiler captures device planes through the axon relay
(dev/probe_profiler.py + dev/xplane_parse.py) — this replaces whole-model
ablation sweeps (one 100-700 s compile per data point) with ONE run that
names exactly where the 79 ms B=8 forward goes.

Usage: python dev/probe_profile_forward.py [out_dir] [extra env pre-set].
Prints the aggregated XLA-op table; the raw trace stays in out_dir.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import time

import jax
import jax.numpy as jnp

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

os.environ.setdefault("IR_ADS_SWIN_ATTN", "pallas4,pallas4,pallas6,pallas6")
os.environ.setdefault("IR_ADS_DSCF_ATTN", "pallas3")
os.environ.setdefault("IR_ADS_FFN", "fused")
os.environ.setdefault("IR_ADS_SWIN_PACKED", "1")
os.environ.setdefault("IR_ADS_DSCF_PACKED", "1,1,1,0")

from ir_ads_tpu.models.cmnext import CMNeXt  # noqa: E402

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fwd_trace"

model = CMNeXt(
    backbone="SwinTransformer-B", num_classes=40, dtype=jnp.bfloat16,
    mmst_mask=False,
)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
# FLAT (B, H, W*3) lane-dense feed (round-4, bench default) when set
_flat = os.environ.get("IR_ADS_FLAT_INPUT", "0") not in ("", "0")
_shape = (8, 480, 640 * 3) if _flat else (8, 480, 640, 3)
rgb = jax.random.normal(k1, _shape, jnp.bfloat16)
dte = jax.random.normal(k2, _shape, jnp.bfloat16)
variables = jax.jit(
    lambda: model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
)()
jax.block_until_ready(variables)


@jax.jit
def fwd(v, r, d):
    return jnp.sum(model.apply(v, r, d, train=False)[0])


print("compiling forward...", flush=True)
t0 = time.time()
fwd(variables, rgb, dte).block_until_ready()
print(f"compile {time.time() - t0:.1f}s", flush=True)
fwd(variables, rgb, dte).block_until_ready()

with jax.profiler.trace(out_dir):
    for _ in range(3):
        fwd(variables, rgb, dte).block_until_ready()

xp = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/*.xplane.pb")))
print("trace:", xp, flush=True)
if xp:
    from dev.xplane_parse import summarize

    summarize(xp[-1], top_n=60)
print("PROFILE_DONE", flush=True)
