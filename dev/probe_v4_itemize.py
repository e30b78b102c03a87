#!/usr/bin/env python
"""Round-4 per-pass budget for the stage-0/1 v4 half-block kernels.

COVERAGE "known open items": stage-0 v4 attention calls measure
1.74 ms/call (4/forward) vs a ~0.25 ms naive bound (~0.45 raggedness-
corrected) — a 4x gap, larger than stage-2's 1.35x, so unlike stage 2
there may be real addressable overhead here.  This probe knocks out one
attention pass at a time by monkeypatching ops.pallas_swin._heads_attention
with a KNOCK-gated copy (the v4 kernel body — LN1/qkv/partition/proj —
stays production).

Knocks: bias · mask (neq=None) · max · exp · norm · softmax (all three) ·
qbd · extract.  Knocked variants are WRONG by design; only time matters.

Usage: python dev/probe_v4_itemize.py [stage0|stage1] [knocks,comma]
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

from ir_ads_tpu.ops import pallas_swin as psw
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

B = int(os.environ.get("PROBE_B", "16"))
WS = 12
N = WS * WS
LONG = int(os.environ.get("PROBE_LONG", "26"))
rng = np.random.default_rng(0)

KNOCK: frozenset = frozenset()


def _heads_attention_ablate(qkvw, bias, neq, outw_ref, *, scale, heads, cdt,
                            packed=True, layout="tall", folded=False):
    """Tall packed-layout attention with KNOCK passes removed (the v4
    production path at stages 0-1: heads=4/8, d=32, p=4)."""
    knock = KNOCK
    g_, n, c3 = qkvw.shape
    c = c3 // 3
    d = c // heads
    p = 128 // max(d, 1) if d and 128 % d == 0 else 1
    while p > 1 and heads % p:
        p //= 2
    if "mask" in knock:
        neq = None
    pd = p * d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (p * n, pd), 0) // n
    col_head = jax.lax.broadcasted_iota(jnp.int32, (p * n, pd), 1) // d
    sel = row_head == col_head
    osel = (
        jax.lax.broadcasted_iota(jnp.int32, (p, 1, pd), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (p, 1, pd), 2) // d
    ).astype(jnp.float32)
    if neq is not None:
        neq_t = jnp.tile(neq, (1, p, 1))
    for h0 in range(0, heads, p):
        q = qkvw[:, :, h0 * d : h0 * d + pd]
        k = qkvw[:, :, c + h0 * d : c + h0 * d + pd]
        v = qkvw[:, :, 2 * c + h0 * d : 2 * c + h0 * d + pd]
        if "qbd" in knock:
            q_bd = jnp.tile(q, (1, p, 1))
        else:
            q_bd = jnp.where(sel[None], jnp.tile(q, (1, p, 1)), 0).astype(
                q.dtype
            )
        s = jax.lax.dot_general(
            (q_bd * scale).astype(q.dtype), k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if "bias" not in knock:
            s = s + bias[h0 : h0 + p].reshape(p * n, n)[None]
        if neq is not None:
            s = jnp.where(neq_t, s - 1e9, s)
        if "softmax" in knock:
            pr = s.astype(v.dtype)
        else:
            if "max" in knock:
                ex0 = s
            else:
                ex0 = s - jnp.max(s, axis=-1, keepdims=True)
            ex = ex0 if "exp" in knock else jnp.exp(ex0)
            if "norm" in knock:
                pr = ex.astype(v.dtype)
            else:
                pr = (ex / jnp.sum(ex, axis=-1, keepdims=True)).astype(
                    v.dtype
                )
        o_full = jax.lax.dot_general(
            pr, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if "extract" in knock:
            o = o_full[:, :n, :]
        else:
            o = jnp.sum(o_full.reshape(g_, p, n, pd) * osel[None], axis=1)
        outw_ref[:, :, h0 * d : h0 * d + pd] = o.astype(cdt)


ORDER = [
    "ln_g", "ln_b", "w_qkv", "b_qkv", "w_proj", "b_proj", "bias",
]


def time_fn(tag, fn, x):
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, xx):
        def body(carry, _):
            xc, _ = carry
            out = fn(xc)
            s = jnp.sum(out[:, :1, :1, :1].astype(jnp.float32))
            z = (s * 0.0).astype(xc.dtype)
            return (x + z, s), None

        (_, s_last), _ = jax.lax.scan(
            body, (xx, jnp.float32(0)), None, length=n)
        return s_last

    try:
        t0 = time.time()
        float(many(2, x))
        compile_s = time.time() - t0
        float(many(LONG, x))
        best = None
        for _ in range(3):
            t0 = time.time()
            float(many(2, x))
            ts = time.time() - t0
            t0 = time.time()
            float(many(LONG, x))
            tl = time.time() - t0
            ms = 1000.0 * (tl - ts) / (LONG - 2)
            best = ms if best is None else min(best, ms)
        print(json.dumps({"variant": tag, "call_ms": round(best, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag,
                          "error": f"{type(e).__name__}: {str(e)[:250]}"}),
              flush=True)


def probe_stage(stage, shift, knocks):
    global KNOCK
    H, W, C, HEADS = {
        0: (120, 160, 128, 4),
        1: (60, 80, 256, 8),
    }[stage]
    scale = (C // HEADS) ** -0.5
    hp = -(-H // WS) * WS
    wp = -(-W // WS) * WS
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    params = dict(
        ln_g=jnp.ones((C,), jnp.float32), ln_b=jnp.zeros((C,), jnp.float32),
        w_qkv=r(C, 3 * C), b_qkv=jnp.zeros((3 * C,), jnp.float32),
        w_proj=r(C, C), b_proj=jnp.zeros((C,), jnp.float32),
        bias=r(HEADS, N, N),
    )
    args = [params[k] for k in ORDER]
    region = (
        jnp.asarray(psw.shift_region_ids(hp, wp, WS, shift)) if shift else None
    )
    os.environ["IR_ADS_SWIN_PACKED"] = "1"
    orig = psw._heads_attention
    try:
        for kn in knocks:
            KNOCK = frozenset(kn.split("+")) if kn else frozenset()
            psw._heads_attention = (
                _heads_attention_ablate if KNOCK else orig
            )
            time_fn(
                f"s{stage}_sh{shift}_knock[{kn or 'none'}]",
                lambda xx: psw.pallas_window_block(
                    xx, *args, region, scale, HEADS, WS, shift=shift),
                x,
            )
    finally:
        psw._heads_attention = orig


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "stage0"
    knocks = (sys.argv[2].split(",") if len(sys.argv) > 2 else
              ["", "bias", "mask", "max", "exp", "norm", "softmax",
               "qbd", "extract", "softmax+bias+mask",
               "softmax+bias+mask+qbd+extract"])
    st = 0 if which == "stage0" else 1
    probe_stage(st, 6, knocks)
    probe_stage(st, 0, [k for k in knocks if "mask" not in k])
    print("V4ITEMIZE_DONE", flush=True)
