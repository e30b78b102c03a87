#!/usr/bin/env python
"""Compile-time + runtime probe for the rows rpe builder at bench shapes.

Each DSCF level compiles the kernel alone (no whole-model 10-min compile)
and times it with the chained-scan slope method."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import jax
import jax.numpy as jnp

from ir_ads_tpu.ops.pallas_dscf_rpe import (
    _auto_j_chunk,
    dscf_rpe_bias_rows_pallas,
)

B = 8
LEVELS = [  # (h, w, g, hg)
    (120, 160, 1, 2),
    (60, 80, 2, 2),
    (30, 40, 4, 2),
    (15, 20, 8, 2),
]
S1, S2 = 119, 159
M = 600


def main():
    for lv, (h, w, g, hg) in enumerate(LEVELS):
        bg = B * g
        jc = _auto_j_chunk(M, h, w, S1, S2, hg, 2)
        pos = jax.random.uniform(
            jax.random.PRNGKey(lv), (bg, M, 2), jnp.float32, -1, 1
        )
        table = jax.random.normal(
            jax.random.PRNGKey(99 + lv), (g, hg, S1, S2), jnp.float32
        )

        @functools.partial(jax.jit, static_argnums=(0,))
        def chain(n, pos, table, h=h, w=w):
            def body(c, _):
                out = dscf_rpe_bias_rows_pallas(c, table, h, w, jnp.bfloat16)
                s = jnp.sum(out).astype(jnp.float32)
                return c + (s * 0.0), None

            out, _ = jax.lax.scan(body, pos, None, length=n)
            return jnp.sum(out)

        t0 = time.time()
        float(chain(2, pos, table))
        compile_s = time.time() - t0
        float(chain(12, pos, table))
        t0 = time.time()
        float(chain(2, pos, table))
        ts = time.time() - t0
        t0 = time.time()
        float(chain(12, pos, table))
        tl = time.time() - t0
        ms = 1000.0 * (tl - ts) / 10
        gb = bg * hg * h * M * w * 2 / 1e9
        print(
            f"L{lv}: jc={jc} grid={bg}x{M//jc} compile={compile_s:.0f}s "
            f"run={ms:.2f}ms out={gb:.2f}GB bw_bound={gb/0.81*1000:.2f}ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
