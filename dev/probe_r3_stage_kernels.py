#!/usr/bin/env python
"""Round-3 kernel probe: tall vs wide packed attention at bench shapes.

The round-2 profile left two in-kernel gaps (COVERAGE.md open items):
stage-2 v6 blocks at 29.3 ms vs ~16 MXU floor and stage-0 v4 calls at
1.74 ms vs ~0.25 — both attributed to VPU softmax/mask/extract passes and
the 144->256 lane padding of the N-sided attention dots.  The "wide"
head-minor layout (IR_ADS_SWIN_PACKED=2, ops/pallas_swin._heads_attention)
targets exactly those: scores carry p*N=576 lanes (11% pad instead of 78%)
and the per-head output extraction disappears.

This times the production kernels at the real bench shapes under
PACKED=0/1/2, one process, chained-scan timing.
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

B = 8
WS = 12
N = WS * WS
rng = np.random.default_rng(0)


def _envtag():
    """Suffix the variant tag with the mask/bias env state."""
    m8 = os.environ.get("IR_ADS_SWIN_MASK8", "0")
    bm = os.environ.get("IR_ADS_SWIN_BIASMASK", "0")
    s = ""
    if m8 not in ("", "0"):
        s += f"_mask8-{m8}"
    if bm not in ("", "0"):
        s += "_fold"
    q = os.environ.get("IR_ADS_V6_QKV", "")
    if q:
        s += f"_qkv-{q}"
    return s


def time_fn(tag, fn, x):
    tag = tag + _envtag()
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, xx):
        def body(carry, _):
            xc, _ = carry
            out = fn(xc)
            s = jnp.sum(out).astype(jnp.float32)
            z = (s * 0.0).astype(xc.dtype)
            return (x + z, s), None

        (_, s_last), _ = jax.lax.scan(
            body, (xx, jnp.float32(0)), None, length=n
        )
        return s_last

    try:
        t0 = time.time()
        float(many(2, x))
        compile_s = time.time() - t0
        float(many(18, x))
        t0 = time.time()
        float(many(2, x))
        ts = time.time() - t0
        t0 = time.time()
        float(many(18, x))
        tl = time.time() - t0
        print(json.dumps({
            "variant": tag,
            "call_ms": round(1000.0 * (tl - ts) / 16, 3),
            "compile_s": round(compile_s, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({
            "variant": tag, "error": f"{type(e).__name__}: {str(e)[:300]}"
        }), flush=True)


def v4_stage0(packed, shift=6):
    H, W, C, HEADS = 120, 160, 128, 4
    HP, WP = 120, 168
    scale = (C // HEADS) ** -0.5
    x = jnp.asarray(rng.standard_normal((B, HP, WP, C)), jnp.bfloat16)
    ln_s = jnp.ones((C,), jnp.float32)
    ln_b = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, jnp.float32)
    bqkv = jnp.zeros((3 * C,), jnp.float32)
    wp_ = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
    bp_ = jnp.zeros((C,), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((HEADS, N, N)) * 0.02, jnp.float32)
    region = (
        jnp.asarray(psw.shift_region_ids(HP, WP, WS, shift)) if shift else None
    )
    os.environ["IR_ADS_SWIN_PACKED"] = packed
    time_fn(
        f"v4_stage0_shift{shift}_packed{packed}",
        lambda xx: psw.fused_window_block(
            xx, ln_s, ln_b, wqkv, bqkv, wp_, bp_, bias, region,
            scale, HEADS, WS, H, W, shift,
        ),
        x,
    )


def v6_stage(stage, packed, shift):
    H, W, C, HEADS = {
        2: (30, 40, 512, 16),
        3: (15, 20, 1024, 32),
    }[stage]
    scale = (C // HEADS) ** -0.5
    hp = -(-H // WS) * WS
    wp = -(-W // WS) * WS
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    attn = (
        jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
        r(C, 3 * C), jnp.zeros((3 * C,), jnp.float32),
        r(C, C), jnp.zeros((C,), jnp.float32),
        r(HEADS, N, N),
    )
    hid, ca = 4 * C, C // 16
    tail = (
        jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
        r(C, hid), jnp.zeros((hid,), jnp.float32),
        r(hid, C), jnp.zeros((C,), jnp.float32),
        r(C, ca), jnp.zeros((ca,), jnp.float32),
        r(ca, C), jnp.zeros((C,), jnp.float32),
    )
    region = (
        jnp.asarray(psw.shift_region_ids(hp, wp, WS, shift)) if shift else None
    )
    os.environ["IR_ADS_SWIN_PACKED"] = packed
    time_fn(
        f"v6_stage{stage}_shift{shift}_packed{packed}",
        lambda xx: psw.fused_window_block_v6(
            xx, attn, tail, region, scale, HEADS, WS, shift,
        ),
        x,
    )


def _bm(val):
    os.environ["IR_ADS_SWIN_BIASMASK"] = val


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fold"):
        # folded bias+mask slab (BIASMASK=1, new default) vs the round-2
        # in-kernel region compare (BIASMASK=0) at the shifted shapes
        _bm("1")
        v4_stage0("1", shift=6)
        v6_stage(2, "1", shift=6)
        v6_stage(3, "1", shift=6)
        _bm("0")
        v4_stage0("1", shift=6)
        v6_stage(2, "1", shift=6)
        v6_stage(3, "1", shift=6)
        _bm("1")
    if which in ("all", "wide"):
        _bm("1")
        v4_stage0("2", shift=6)
        v4_stage0("2", shift=0)
        v6_stage(2, "2", shift=6)
        v6_stage(3, "2", shift=6)
    if which in ("v4",):
        for p in ("1", "2", "0"):
            v4_stage0(p, shift=6)
        for p in ("1", "2"):
            v4_stage0(p, shift=0)
    if which in ("v6",):
        for p in ("1", "2"):
            v6_stage(2, p, shift=6)
            v6_stage(2, p, shift=0)
            v6_stage(3, p, shift=6)
    if which in ("qkv",):
        # fd54e38 A/B: qkv on real tokens + bias-row output pad ('real')
        # vs zero-pad-first projection ('padded') — suspected 240x
        # whole-forward regression (sweeps 2-3 on 2026-08-19).
        prev_qkv = os.environ.get("IR_ADS_V6_QKV")
        for q in ("padded", "real"):
            os.environ["IR_ADS_V6_QKV"] = q
            for st in (2, 3):
                for sh in (0, 6):
                    v6_stage(st, "1", shift=sh)
        # restore the caller's override instead of dropping it (ADVICE r3)
        if prev_qkv is None:
            os.environ.pop("IR_ADS_V6_QKV", None)
        else:
            os.environ["IR_ADS_V6_QKV"] = prev_qkv
    if which in ("all", "mask8"):
        # prebuilt neq-mask operand vs in-kernel region compare: the
        # shifted/unshifted v4 delta (2.165 vs 0.165 ms) is ~all mask cost
        for m8 in ("0", "1", "32"):
            os.environ["IR_ADS_SWIN_MASK8"] = m8
            os.environ["IR_ADS_SWIN_BIASMASK"] = "0"
            v4_stage0("1", shift=6)
            v6_stage(2, "1", shift=6)
            v6_stage(3, "1", shift=6)
        os.environ["IR_ADS_SWIN_MASK8"] = "0"
    print("R3KERNELS_DONE", flush=True)
