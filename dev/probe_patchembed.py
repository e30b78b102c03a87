#!/usr/bin/env python
"""Round-4: patch-embed input-glue cost (COVERAGE open item ~1.6 ms).

The per-fusion profile charges ~1.6 ms of the B=8 480x640 forward to
[8,480,640,3] layout copies + the [8,120,160,4,4,3] patchify relayout.
Hypothesis: the trailing dim of 3 forces (8,128)-tiled HBM buffers padded
42x, so every op touching the NHWC-3 input pays ~630 MB of padded traffic.
Variants (both compute the SAME patchify matmul + bias):

  nhwc   production PatchEmbed math from (B, 480, 640, 3)
  flat   the same from a lane-dense (B, 480, 1920) input (host feeds the
         reshape for free; device never materializes a 3-lane buffer)

Run: python dev/probe_patchembed.py
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

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

B, H, W, C, P, E = 8, 480, 640, 3, 4, 128
rng = np.random.default_rng(0)


def timeit(tag, fn, *args, long=24):
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, *a):
        def body(carry, _):
            cur, _ = carry
            s = jnp.sum(fn(*cur)[:, :1, :1, :1].astype(jnp.float32))
            z = s * 0.0
            new = tuple(x + z.astype(x.dtype) for x in a)
            return (new, s), None

        (_, s), _ = jax.lax.scan(body, (a, jnp.float32(0)), None, length=n)
        return s

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


def patchify_nhwc(x, wk2, bias):
    b, h, w, c = x.shape
    xp = (
        x.reshape(b, h // P, P, w // P, P, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // P, w // P, P * P * c)
    )
    return xp @ wk2 + bias


def patchify_flat(x2, wk2f, bias):
    # x2: (B, H, W*C) lane-dense; weight rows permuted to match the
    # (p, w-patch*c) slice order
    b, h, wc = x2.shape
    xp = (
        x2.reshape(b, h // P, P, wc // (P * C), P * C)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h // P, wc // (P * C), P * P * C)
    )
    return xp @ wk2f + bias


if __name__ == "__main__":
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, jnp.bfloat16)
    wk = jnp.asarray(rng.standard_normal((P, P, C, E)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((E,)) * 0.01, jnp.bfloat16)
    wk2 = wk.reshape(P * P * C, E)
    # flat variant's row order: (p_row, x_in_patch, c) == the natural
    # (P, P, C) order -> identical wk2 (verified on CPU in tests)
    x2 = x.reshape(B, H, W * C)

    a = patchify_nhwc(x, wk2, bias)
    bflat = patchify_flat(x2, wk2, bias)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bflat.astype(jnp.float32))))
    print(json.dumps({"check": "flat_vs_nhwc", "max_abs": err}), flush=True)

    timeit("patchify_nhwc", patchify_nhwc, x, wk2, bias)
    timeit("patchify_flat", patchify_flat, x2, wk2, bias)
    print("PATCHEMBED_DONE", flush=True)
