#!/usr/bin/env python
"""Round-4 intra-kernel budget: per-pass VPU cost of the stage-2/3 v6 kernel.

VERDICT r3 item 1: the stage-2 in-kernel gap (29.3 ms vs ~16 ms MXU floor)
has never been itemized below whole-kernel granularity.  This probe times
the production v6 whole-block kernel at the real bench shapes (stage 2:
B=16 dual-stream grid, 30x40xC512, 16 heads; stage 3: 15x20xC1024, 32
heads) with individual passes KNOCKED OUT, one at a time:

  bias     skip the rel-pos bias add
  mask     skip the shift-region neq build + where   (shifted blocks only)
  max      skip the softmax max-subtract pass
  exp      replace exp with identity (keeps shapes/dots)
  norm     skip the softmax denominator + divide
  softmax  max+exp+norm all out (pr = s cast to compute dtype)
  qbd      tall-layout block-diag Q build: tile WITHOUT the where(sel)
  extract  tall-layout per-head output extract (osel mult + reduce) out
  gelu     FFN GELU -> max(x, 0)
  ln       both LayerNorms -> scale+shift only (no mean/var/rsqrt)
  tail     whole FFN+adapter tail out (y passes through)

The knocked-out variants compute WRONG results by design — only the time
matters.  Timing: chained device-side scan, 2-vs-LONG slope (relay-safe).
Results feed COVERAGE.md's round-4 per-pass budget table.
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

from ir_ads_tpu.ops import pallas_swin as psw
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()

B = int(os.environ.get("PROBE_B", "16"))  # dual-stream production batch
WS = 12
N = WS * WS
LONG = int(os.environ.get("PROBE_LONG", "34"))
rng = np.random.default_rng(0)

KNOCK: frozenset = frozenset()  # set per-variant before tracing


def _heads_attention_ablate(qkvw, bias, neq, outw_ref, *, scale, heads, cdt,
                            packed, layout="tall"):
    """Tall/wide packed attention with KNOCK passes removed.  Mirrors
    ops/pallas_swin._heads_attention (folded path not covered here)."""
    knock = KNOCK
    g_, n, c3 = qkvw.shape
    c = c3 // 3
    d = c // heads
    p = 128 // max(d, 1) if d and 128 % d == 0 else 1
    while p > 1 and heads % p:
        p //= 2
    if "mask" in knock:
        neq = None

    if packed and p > 1 and heads % p == 0 and layout == "wide":
        pd = p * d
        row_head = jax.lax.broadcasted_iota(jnp.int32, (p * n, pd), 0) // n
        col_head = jax.lax.broadcasted_iota(jnp.int32, (p * n, pd), 1) // d
        sel = row_head == col_head
        sel_f = sel.astype(qkvw.dtype)
        if neq is not None:
            maskf = jnp.where(neq, -1e9, 0.0).astype(jnp.float32)
            maskf_w = maskf if p == 1 else jnp.concatenate([maskf] * p, -1)
        for h0 in range(0, heads, p):
            q = qkvw[:, :, h0 * d : h0 * d + pd]
            k = qkvw[:, :, c + h0 * d : c + h0 * d + pd]
            v = qkvw[:, :, 2 * c + h0 * d : 2 * c + h0 * d + pd]
            if "bd" in knock:
                k_bd = jnp.tile(k, (1, p, 1))
                v_bd = jnp.tile(v, (1, p, 1))
            else:
                k_bd = jnp.where(sel[None], jnp.tile(k, (1, p, 1)), 0).astype(k.dtype)
                v_bd = jnp.where(sel[None], jnp.tile(v, (1, p, 1)), 0).astype(v.dtype)
            s = jax.lax.dot_general(
                (q * scale).astype(q.dtype), k_bd,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if "bias" not in knock:
                bias_w = jnp.concatenate([bias[h0 + j] for j in range(p)], -1)
                if neq is not None:
                    s = s + (bias_w[None] + maskf_w)
                else:
                    s = s + bias_w[None]
            elif neq is not None:
                s = s + maskf_w
            if "softmax" in knock:
                ex = s.astype(v.dtype)
            else:
                if "max" in knock:
                    ex0 = s
                else:
                    mx = jnp.max(s, axis=-1, keepdims=True)
                    ex0 = s - mx
                ex = (ex0 if "exp" in knock else jnp.exp(ex0)).astype(v.dtype)
            o_num = jax.lax.dot_general(
                ex, v_bd,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if "norm" in knock or "softmax" in knock:
                o = o_num
            else:
                den = jax.lax.dot_general(
                    ex, sel_f,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o = o_num / jnp.maximum(den, 1e-30)
            outw_ref[:, :, h0 * d : h0 * d + pd] = o.astype(cdt)
        return

    # tall layout (the production default at stages 2-3)
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
            q_bd = jnp.where(sel[None], jnp.tile(q, (1, p, 1)), 0).astype(q.dtype)
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
                mx = jnp.max(s, axis=-1, keepdims=True)
                ex0 = s - mx
            ex = ex0 if "exp" in knock else jnp.exp(ex0)
            if "norm" in knock:
                pr = ex.astype(v.dtype)
            else:
                pr = (ex / jnp.sum(ex, axis=-1, keepdims=True)).astype(v.dtype)
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


def _kernel_v6_ablate(
    x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
    region_ref, g2_ref, b2_ref, w1_ref, b1_ref, w2_ref, b2f_ref,
    aw1_ref, ab1_ref, aw2_ref, ab2_ref, o_ref, outw_ref, *,
    eps, scale, heads, ws, shift, hp, wp, pack, adapter_scale,
    layout="tall", folded=False, mask8=False,
):
    """_attn_kernel_v6 with KNOCK-controlled passes (qkv mode 'real')."""
    knock = KNOCK
    x = x_ref[0]
    h_, w_, c = x.shape
    n = ws * ws
    nwin_w = wp // ws
    cdt = wqkv_ref.dtype

    xf = x.reshape(h_ * w_, c).astype(jnp.float32)
    if "ln" in knock:
        xn = xf
    else:
        mu = jnp.mean(xf, axis=1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=1, keepdims=True)
        xn = xc * jax.lax.rsqrt(var + eps)
    xn = (xn * g_ref[...].astype(jnp.float32)
          + b_ref[...].astype(jnp.float32)).astype(cdt)

    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(cdt).reshape(h_, w_, 3 * c)
    bpad = bqkv_ref[...].astype(cdt).reshape(1, 1, 3 * c)
    if wp != w_:
        qkv = jnp.concatenate(
            [qkv, jnp.broadcast_to(bpad, (h_, wp - w_, 3 * c))], axis=1)
    if hp != h_:
        qkv = jnp.concatenate(
            [qkv, jnp.broadcast_to(bpad, (hp - h_, wp, 3 * c))], axis=0)
    if shift:
        qkv = jnp.concatenate([qkv[shift:], qkv[:shift]], axis=0)
        qkv = jnp.concatenate([qkv[:, shift:], qkv[:, :shift]], axis=1)
    qkvw = (
        qkv.reshape(hp // ws, ws, nwin_w, ws, 3 * c)
        .transpose(0, 2, 1, 3, 4)
        .reshape((hp // ws) * nwin_w, n, 3 * c)
    )
    region = region_ref[...]
    # production computes the neq mask even when region is all-zeros
    # (unshifted blocks) — keep that for the baseline; the "mask" knock
    # then measures exactly the dead-mask cost
    neq = region[:, :, None] != region[:, None, :]
    _heads_attention_ablate(
        qkvw, bias_ref[...], neq, outw_ref,
        scale=scale, heads=heads, cdt=cdt, packed=pack, layout=layout,
    )
    att = (
        outw_ref[...]
        .reshape(hp // ws, nwin_w, ws, ws, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(hp, wp, c)
    )
    if shift:
        att = jnp.concatenate([att[hp - shift:], att[:hp - shift]], axis=0)
        att = jnp.concatenate(
            [att[:, wp - shift:], att[:, :wp - shift]], axis=1)
    att = att[:h_, :w_].reshape(h_ * w_, c)
    y = xf + (
        jax.lax.dot_general(
            att, wp_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bp_ref[...].astype(jnp.float32)
    )

    if "tail" in knock:
        o_ref[0] = y.astype(o_ref.dtype).reshape(h_, w_, c)
        return
    hw = h_ * w_
    chunk = min(2048, hw)
    outs = []
    for r0 in range(0, hw, chunk):
        r1 = min(r0 + chunk, hw)
        yb = y[r0:r1]
        if "ln" in knock:
            yn = yb
        else:
            mu2 = jnp.mean(yb, axis=1, keepdims=True)
            yc = yb - mu2
            var2 = jnp.mean(yc * yc, axis=1, keepdims=True)
            yn = yc * jax.lax.rsqrt(var2 + eps)
        yn = (yn * g2_ref[...].astype(jnp.float32)
              + b2_ref[...].astype(jnp.float32)).astype(cdt)
        hdn = jax.lax.dot_general(
            yn, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...].astype(jnp.float32)
        if "gelu" in knock:
            hdn = jnp.maximum(hdn, 0.0).astype(cdt)
        else:
            hdn = jax.nn.gelu(hdn, approximate=True).astype(cdt)
        ffn = jax.lax.dot_general(
            hdn, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2f_ref[...].astype(jnp.float32)
        aw1 = aw1_ref[...] if aw1_ref.ndim == 2 else aw1_ref[0]
        ab1 = ab1_ref[...] if ab1_ref.ndim == 2 else ab1_ref[0]
        aw2 = aw2_ref[...] if aw2_ref.ndim == 2 else aw2_ref[0]
        ab2 = ab2_ref[...] if ab2_ref.ndim == 2 else ab2_ref[0]
        a = jax.lax.dot_general(
            yb.astype(cdt), aw1,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ab1.astype(jnp.float32)
        a = jnp.maximum(a, 0.0).astype(cdt)
        a = jax.lax.dot_general(
            a, aw2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ab2.astype(jnp.float32)
        outs.append((yb + ffn + adapter_scale * a).astype(o_ref.dtype))
    o_ref[0] = (
        outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    ).reshape(h_, w_, c)


def time_fn(tag, fn, x):
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, xx):
        def body(carry, _):
            xc, _ = carry
            out = fn(xc)
            s = jnp.sum(out).astype(jnp.float32)
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
        print(json.dumps({
            "variant": tag, "call_ms": round(best, 3),
            "compile_s": round(compile_s, 1),
        }), flush=True)
        return best
    except Exception as e:
        print(json.dumps({
            "variant": tag, "error": f"{type(e).__name__}: {str(e)[:300]}"
        }), flush=True)
        return None


def probe_stage(stage, shift, packed, knocks):
    global KNOCK
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
    orig = psw._attn_kernel_v6
    psw._attn_kernel_v6 = _kernel_v6_ablate
    try:
        for kn in knocks:
            KNOCK = frozenset(kn.split("+")) if kn else frozenset()
            time_fn(
                f"s{stage}_sh{shift}_p{packed}_knock[{kn or 'none'}]",
                lambda xx: psw.pallas_window_block_v6(
                    xx, attn, tail, region, scale, HEADS, WS, shift=shift),
                x,
            )
    finally:
        psw._attn_kernel_v6 = orig


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "stage2"
    knocks = (sys.argv[2].split(",") if len(sys.argv) > 2 else
              ["", "bias", "mask", "max", "exp", "norm", "softmax",
               "qbd", "extract", "gelu", "ln", "tail",
               "softmax+bias+mask", "softmax+bias+mask+qbd+extract+gelu+ln"])
    if which == "stage2":
        probe_stage(2, 6, "1", knocks)
        probe_stage(2, 0, "1", [k for k in knocks if "mask" not in k])
    elif which == "stage2wide":
        probe_stage(2, 6, "2", [k for k in knocks
                                if k not in ("qbd", "extract")])
    elif which == "stage3":
        probe_stage(3, 6, "1", knocks)
        probe_stage(3, 0, "1", [k for k in knocks if "mask" not in k])
    print("V6ITEMIZE_DONE", flush=True)
