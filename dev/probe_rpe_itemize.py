#!/usr/bin/env python
"""Round-4 intra-kernel budget for the DSCF rpe rows builder.

VERDICT r3 item 5: rpe builder 5.4 ms of the 75 ms forward; target <=2.5.
This probe times the production rows kernel (ops/pallas_dscf_rpe.
_rpe_rows_kernel) at the bench per-level shapes with passes knocked out:

  hat    wy/wxT hat-weight construction -> constants (keeps dots + store)
  udot   u dot out (u = table rows broadcast; keeps hat + bias dot)
  bdot   bias dot out (bias = u slice broadcast; keeps hat + u dot)
  dots   both dots out (isolates hat build + store)
  store  full compute, store a constant (isolates the HBM write... the
         compute is dead then, so this measures store+overhead only)

plus a j_chunk sweep on the baseline.  Knocked variants compute WRONG
results by design; only time matters.  Run on the real TPU:
  python dev/probe_rpe_itemize.py [L0|L1|L2|all] [knocks,comma]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ir_ads_tpu.ops import pallas_dscf_rpe as rpe
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

rng = np.random.default_rng(0)
LONG = int(os.environ.get("PROBE_LONG", "18"))

# bench per-level shapes (B=8 dual-stream forward, dscf_groups (1,2,4,8),
# dscf_heads (2,4,8,16), stride (8,4,2,1) -> key grid 15x20 = n 300 per
# offset field; the builder runs on pos_cat so M = 2n = 600.  rpe table is
# the reference default q_size (60, 80) -> (119, 159).
LEVELS = {
    "L0": dict(bg=8, hg=2, h=120, w=160, m=600),
    "L1": dict(bg=16, hg=2, h=60, w=80, m=600),
    "L2": dict(bg=32, hg=2, h=30, w=40, m=600),
    # L3 runs the XLA einsum path in production (rows kernel was 2.9 ms
    # there, r2); timed here via the einsum twin for the level-3 slice
    "L3": dict(bg=64, hg=2, h=15, w=20, m=600),
}
S1, S2 = 119, 159
KNOCK: frozenset = frozenset()


def _rows_kernel_ablate(pos_ref, table_ref, out_ref, *, h, w, s1, s2, jc, hg,
                        out_dtype):
    knock = KNOCK
    ay = (s1 - 1.0) / (2.0 * (h - 1.0))
    ax = (s2 - 1.0) / (2.0 * (w - 1.0))
    pos = pos_ref[0]
    by = (0.5 - 0.5 * pos[:, 0:1]) * 0.5 * (s1 - 1.0)
    bx = (0.5 - 0.5 * pos[:, 1:2]) * 0.5 * (s2 - 1.0)
    cdt = (
        jnp.bfloat16 if jnp.dtype(out_dtype) == jnp.bfloat16 else jnp.float32
    )
    if "hat" in knock:
        wy = jnp.broadcast_to(
            (by[:, :, None] * 0.0 + 0.01).astype(cdt), (jc, h, s1))
        wxT = jnp.broadcast_to(
            (bx[:, :, None] * 0.0 + 0.01).astype(cdt), (jc, s2, w))
    else:
        r2 = jax.lax.broadcasted_iota(jnp.int32, (h, s1), 0).astype(jnp.float32)
        s_2 = jax.lax.broadcasted_iota(jnp.int32, (h, s1), 1).astype(jnp.float32)
        t2 = jax.lax.broadcasted_iota(jnp.int32, (s2, w), 0).astype(jnp.float32)
        c2 = jax.lax.broadcasted_iota(jnp.int32, (s2, w), 1).astype(jnp.float32)
        base_y = ay * r2 - s_2
        base_x = ax * c2 - t2
        wy = jnp.maximum(
            0.0, 1.0 - jnp.abs(base_y[None] + by[:, :, None])).astype(cdt)
        wxT = jnp.maximum(
            0.0, 1.0 - jnp.abs(base_x[None] + bx[:, :, None])).astype(cdt)
    if "store" in knock:
        z = (jnp.sum(wy[0, 0]) + jnp.sum(wxT[0, 0])) * 0.0
        out_ref[0] = jnp.full(out_ref.shape[1:], 0.01, out_dtype) + z.astype(
            out_dtype
        )
        return
    for e in range(hg):
        if "udot" in knock or "dots" in knock:
            u = (
                jnp.zeros((jc, w, s1), cdt)
                + table_ref[0, e, 0, 0].astype(cdt)
                + (wxT[:, 0:1, 0:1] * 0).astype(cdt)
            )
        else:
            u = jax.lax.dot_general(
                wxT, table_ref[0, e].astype(cdt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
        if "bdot" in knock or "dots" in knock:
            bias = (
                jnp.zeros((jc, h, w), jnp.float32)
                + u[:, 0:1, 0:1].astype(jnp.float32)
                + (wy[:, 0:1, 0:1] * 0).astype(jnp.float32)
            )
        else:
            bias = jax.lax.dot_general(
                wy, u,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, e] = bias.transpose(1, 0, 2).astype(out_dtype)


def time_fn(tag, fn, *args):
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, *a):
        # thread args through the carry: loop-invariant inputs let XLA
        # hoist the whole body (the msdeform-forms probe measured
        # negative ms that way)
        def body(carry, _):
            cur, _ = carry
            out = fn(*cur)
            s = jnp.sum(out[(0,) * (out.ndim - 1)][:1].astype(jnp.float32))
            z = s * 0.0
            new = tuple(x + z.astype(x.dtype) for x in a)
            return (new, s), None

        (_, s), _ = jax.lax.scan(body, (a, jnp.float32(0)), None, length=n)
        return s

    try:
        t0 = time.time()
        float(many(2, *args))
        compile_s = time.time() - t0
        float(many(LONG, *args))
        best = None
        for _ in range(3):
            t0 = time.time()
            float(many(2, *args))
            ts = time.time() - t0
            t0 = time.time()
            float(many(LONG, *args))
            tl = time.time() - t0
            ms = 1000.0 * (tl - ts) / (LONG - 2)
            best = ms if best is None else min(best, ms)
        print(json.dumps({"variant": tag, "ms": round(best, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag,
                          "error": f"{type(e).__name__}: {str(e)[:250]}"}),
              flush=True)


def xla_einsum_rpe(pos, table, h, w, store=jnp.bfloat16):
    """The production XLA einsum path (swin.py rpe_bias, head_minor) at
    builder shapes: pos (BG, M, 2), table (G, S1, S2, hg) -> bias
    (BG, h*w, hg, M).  This is what level 3 runs in production."""
    bg, m, _ = pos.shape
    g = table.shape[0]
    hg = table.shape[3]
    s1, s2 = S1, S2
    qy = jnp.arange(h, dtype=jnp.float32) / max(h - 1, 1) * 2.0 - 1.0
    qx = jnp.arange(w, dtype=jnp.float32) / max(w - 1, 1) * 2.0 - 1.0
    iy = (0.5 * (qy[None, None, :] - pos[:, :, 0:1]) + 1.0) * 0.5 * (s1 - 1)
    ix = (0.5 * (qx[None, None, :] - pos[:, :, 1:2]) + 1.0) * 0.5 * (s2 - 1)
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(iy[..., None] - jnp.arange(s1, dtype=jnp.float32))
    ).astype(store)
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(ix[..., None] - jnp.arange(s2, dtype=jnp.float32))
    ).astype(store)
    tb = jnp.broadcast_to(
        table[None].astype(store), (bg // g, g, s1, s2, hg)
    ).reshape(bg, s1, s2, hg)
    u = jnp.einsum(
        "bste,bnct->bncse", tb, wx, preferred_element_type=jnp.float32
    ).astype(store)
    bias = jnp.einsum(
        "bnrs,bncse->brcen", wy, u, preferred_element_type=jnp.float32
    ).astype(store)
    return bias.reshape(bg, h * w, hg, m)


def probe_level(lvl, knocks, j_chunks=(0,)):
    global KNOCK
    cfg = LEVELS[lvl]
    bg, hg, h, w, m = cfg["bg"], cfg["hg"], cfg["h"], cfg["w"], cfg["m"]
    pos = jnp.asarray(rng.random((bg, m, 2)) * 2 - 1, jnp.float32)
    g = bg // 8 if bg >= 8 else 1
    table = jnp.asarray(rng.standard_normal((g, hg, S1, S2)) * 0.02,
                        jnp.float32)

    if lvl == "L3":
        # production path at L3: two head-minor einsum calls of n = M/2
        half = pos[:, : m // 2]
        tbl_hm = jnp.transpose(table, (0, 2, 3, 1))  # (g, S1, S2, hg)
        time_fn(
            f"{lvl}_xla_einsum_half",  # production does this TWICE
            lambda p, t: xla_einsum_rpe(p, t, h, w),
            half, tbl_hm,
        )
        time_fn(
            f"{lvl}_rows_kernel",  # the r2-rejected rows kernel, for scale
            lambda p, t: rpe.dscf_rpe_bias_rows_pallas(p, t, h, w),
            pos, table,
        )
        time_fn(
            f"{lvl}_packed_kernel",  # round-4 replacement (hw on lanes)
            lambda p, t: rpe.dscf_rpe_bias_packed_pallas(p, t, h, w),
            pos, table,
        )
        for jc in (120, 200):
            time_fn(
                f"{lvl}_packed_kernel_jc{jc}",
                lambda p, t, jc=jc: rpe.dscf_rpe_bias_packed_pallas(
                    p, t, h, w, j_chunk=jc),
                pos, table,
            )
        return

    orig = rpe._rpe_rows_kernel
    try:
        for jc_ov in j_chunks:
            for kn in knocks:
                KNOCK = frozenset(kn.split("+")) if kn else frozenset()
                rpe._rpe_rows_kernel = (
                    _rows_kernel_ablate if KNOCK else orig
                )
                kw = {}
                if jc_ov:
                    kw["j_chunk"] = jc_ov
                time_fn(
                    f"{lvl}_jc{jc_ov or 'auto'}_knock[{kn or 'none'}]",
                    lambda p, t: rpe.dscf_rpe_bias_rows_pallas(
                        p, t, h, w, **kw),
                    pos, table,
                )
    finally:
        rpe._rpe_rows_kernel = orig


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    knocks = (sys.argv[2].split(",") if len(sys.argv) > 2 else
              ["", "hat", "udot", "bdot", "dots", "store"])
    levels = [which] if which in LEVELS else list(LEVELS)
    for lv in levels:
        probe_level(lv, knocks)
    print("RPE_ITEMIZE_DONE", flush=True)
