#!/usr/bin/env python
"""Why does the persistent compile cache miss on r5 kernel programs?

BENCH_r03 compile_s regressed 27.8 -> 789.3 s with an 11 GB cache on disk
(VERDICT r3 weak #5).  The hypothesis is that Mosaic kernel custom calls
embed something unstable in the cache key (or the axon remote-compile path
bypasses the executable cache).  This probe compiles ONE representative v6
whole-block program with ``jax_explain_cache_misses`` on and prints the
compile wall time; run it twice back-to-back (same process args) — the
second run (and a second PROCESS) should be a cache hit taking <5 s.

Usage: python dev/probe_cache_miss.py [tag]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()
jax.config.update("jax_explain_cache_misses", True)

from ir_ads_tpu.ops import pallas_swin as psw  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "run"
H, W, C, HEADS, WS, SHIFT = 30, 40, 512, 16, 12, 6
B = 4
rng = np.random.default_rng(0)


def main():
    hp = -(-H // WS) * WS
    wp = -(-W // WS) * WS
    n = WS * WS
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    attn = (
        jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
        r(C, 3 * C), jnp.zeros((3 * C,), jnp.float32),
        r(C, C), jnp.zeros((C,), jnp.float32),
        r(HEADS, n, n),
    )
    hid, ca = 4 * C, C // 16
    tail = (
        jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
        r(C, hid), jnp.zeros((hid,), jnp.float32),
        r(hid, C), jnp.zeros((C,), jnp.float32),
        r(C, ca), jnp.zeros((ca,), jnp.float32),
        r(ca, C), jnp.zeros((C,), jnp.float32),
    )
    region = jnp.asarray(psw.shift_region_ids(hp, wp, WS, SHIFT))
    scale = (C // HEADS) ** -0.5

    fn = jax.jit(
        lambda xx, a, t: psw.pallas_window_block_v6(
            xx, a, t, region, scale, HEADS, WS, shift=SHIFT
        )
    )
    for i in range(2):
        t0 = time.time()
        out = fn(x, attn, tail)
        s = float(jnp.sum(out.astype(jnp.float32)))
        dt = time.time() - t0
        print(json.dumps({
            "tag": TAG, "call": i, "wall_s": round(dt, 2),
            "checksum": round(s, 2),
        }), flush=True)
    print("CACHE_MISS_PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
