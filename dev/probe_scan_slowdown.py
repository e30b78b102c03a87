#!/usr/bin/env python
"""Diagnose the scan-wrapped forward pathology (sweeps 2026-08-19).

Device xplane profiling showed the bench forward at 74 ms/call, yet the
same forward wrapped in the timing harness's ``lax.scan`` measures 15-25
SECONDS per iteration (dev/sweep_env.py logs).  This probe compiles BOTH
forms in one process under the bench r5 env, times them, and profiles the
scan form so the xplane table names the guilty op.

Usage: python dev/probe_scan_slowdown.py [n_iters]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import glob
import json
import time

import jax
import jax.numpy as jnp

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

os.environ.setdefault("IR_ADS_SWIN_ATTN", "pallas4,pallas4,pallas6,pallas6")
os.environ.setdefault("IR_ADS_DSCF_ATTN", "pallas3,pallas3,pallas3,xla")
os.environ.setdefault("IR_ADS_FFN", "fused")
os.environ.setdefault("IR_ADS_SWIN_PACKED", "1")
os.environ.setdefault("IR_ADS_DSCF_PACKED", "1,1,1,0")

from ir_ads_tpu.models.cmnext import CMNeXt  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4

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
print("init done", flush=True)


@jax.jit
def fwd(v, r, d):
    return jnp.sum(model.apply(v, r, d, train=False)[0])


@functools.partial(jax.jit, static_argnums=(0,))
def many(n, v, r, d):
    def body(carry, _):
        rr, dd, _ = carry
        s = fwd(v, rr, dd).astype(jnp.float32)
        z = (s * 0.0).astype(rr.dtype)
        return (rgb + z, dte + z, s), None

    (_, _, s_last), _ = jax.lax.scan(
        body, (r, d, jnp.float32(0)), None, length=n
    )
    return s_last


t0 = time.time()
fwd(variables, rgb, dte).block_until_ready()
print(json.dumps({"fwd_compile_s": round(time.time() - t0, 1)}), flush=True)
t0 = time.time()
for _ in range(N):
    fwd(variables, rgb, dte).block_until_ready()
print(
    json.dumps({"fwd_dispatch_ms": round((time.time() - t0) / N * 1000, 1)}),
    flush=True,
)

t0 = time.time()
float(many(2, variables, rgb, dte))
print(json.dumps({"scan2_compile_s": round(time.time() - t0, 1)}), flush=True)
t0 = time.time()
float(many(2, variables, rgb, dte))
t2 = time.time() - t0
print(json.dumps({"scan2_s": round(t2, 2)}), flush=True)

# profile ONE scan2 invocation: the device plane will show where time goes
out_dir = "/tmp/scan_trace"
with jax.profiler.trace(out_dir):
    float(many(2, variables, rgb, dte))
xp = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/*.xplane.pb")))
print("trace:", xp, flush=True)
if xp:
    from dev.xplane_parse import summarize

    summarize(xp[-1], top_n=40)
print("SCANPROBE_DONE", flush=True)
