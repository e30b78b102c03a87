"""Fused window-attention Pallas kernel for Swin on TPU.

Why a kernel: the XLA path materializes the (B*nW, heads, N, N) attention
tensor in HBM twice (QK^T out, softmax out) — at 480x640 that is ~140
windows x heads x 144^2 floats per block, pure HBM bandwidth.  This kernel
keeps the attention matrix in VMEM: one HBM read of q/k/v, one write of the
output.

Masking trick: the SW-MSA mask is NOT passed as a dense (nW, N, N) tensor
(11+ MB at 480x640).  Shifted-window masking is equivalent to "tokens from
different shift regions don't attend", so we pass per-token int32 region ids
(nW, N) and build the -inf mask on the fly in VMEM with one compare.

Semantics match ir_ads_tpu.ops.window_attention.window_attention exactly
(tests/test_pallas_swin.py), which itself matches the reference WindowMSA
(semseg/models/backbones/swin.py:81-119).

Backward: jax.custom_vjp whose bwd recomputes via the XLA reference — the
kernel accelerates inference/eval (the headline benchmark path); training
gradients are mathematically identical to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ir_ads_tpu.ops.window_attention import (
    shift_window_mask,
    window_attention as xla_window_attention,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, region_ref, o_ref, *, scale, n):
    """One (window-chunk, head) tile.

    q/k/v refs: (1, G, N, D) VMEM; bias: (1, N, N); region: (G, N) int32;
    out: (1, G, N, D).
    """
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    attn = jax.lax.dot_general(
        q * scale,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, N, N)
    attn = attn + bias_ref[0].astype(jnp.float32)[None]
    region = region_ref[:]
    neq = region[:, :, None] != region[:, None, :]
    attn = jnp.where(neq, attn - 1e9, attn)
    # padded tail columns (N padded up) carry region id -1 on real rows ->
    # already masked by the region compare; padded rows produce garbage that
    # the caller slices away.
    attn = jax.nn.softmax(attn, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        attn.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def pallas_window_attention(
    q: jax.Array,  # (B*nW, heads, N, D)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,  # (heads, N, N)
    region: Optional[jax.Array],  # (nW, N) int32 or None (no shift)
    scale: float,
    window_chunk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    bn, h, n, d = q.shape
    n_pad = _round_up(n, 128)
    d_pad = _round_up(d, 128)
    g = window_chunk
    bn_pad = _round_up(bn, g)  # window-count padding (Mosaic sublane rule)

    # layout: (heads, B*nW, N, D) so heads is a clean grid axis
    def to_hw(t):
        t = t.transpose(1, 0, 2, 3)
        return jnp.pad(
            t, ((0, 0), (0, bn_pad - bn), (0, n_pad - n), (0, d_pad - d))
        )

    qh, kh, vh = to_hw(q), to_hw(k), to_hw(v)
    bias_p = jnp.pad(bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)))

    if region is None:
        region_full = jnp.zeros((bn, n), jnp.int32)
    else:
        nw = region.shape[0]
        region_full = jnp.tile(region, (bn // nw, 1))
    # padded key columns get id -1 => masked vs any real token id >= 0;
    # padded windows are all -1 (self-consistent garbage, sliced off below)
    region_full = jnp.pad(
        region_full,
        ((0, bn_pad - bn), (0, n_pad - n)),
        constant_values=-1,
    )

    grid = (bn_pad // g, h)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n=n),
        out_shape=jax.ShapeDtypeStruct((h, bn_pad, n_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, g, n_pad, d_pad), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, n_pad, d_pad), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, n_pad, d_pad), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, n_pad), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, g, n_pad, d_pad), lambda i, j: (j, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(
        qh,
        kh,
        vh,
        bias_p,
        region_full,
    )
    out = out[:, :bn, :n, :d].transpose(1, 0, 2, 3)  # (B*nW, heads, N, D)
    return out


def _region_mask_attention(q, k, v, bias, region, scale):
    """XLA twin of the kernel used for the backward pass: identical math,
    region-id masking expressed densely."""
    bn = q.shape[0]
    if region is None:
        mask = None
    else:
        nw = region.shape[0]
        neq = region[:, :, None] != region[:, None, :]
        mask = jnp.where(neq, -1e9, 0.0).astype(jnp.float32)
    return xla_window_attention(q, k, v, bias, mask, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_window_attention(q, k, v, bias, region, scale):
    """Pallas forward + XLA-recompute backward.  region: (nW, N) int32 ids
    (use zeros for unshifted windows)."""
    return pallas_window_attention(q, k, v, bias, region, scale)


def _fused_fwd(q, k, v, bias, region, scale):
    out = pallas_window_attention(q, k, v, bias, region, scale)
    return out, (q, k, v, bias, region)


def _fused_bwd(scale, res, g):
    q, k, v, bias, region = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _region_mask_attention(q_, k_, v_, b_, region, scale),
        q, k, v, bias,
    )
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias, jnp.zeros_like(region)


fused_window_attention.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# v2 kernel: lane-resident heads, no D/N padding of the HBM operands.
#
# The v1 kernel above rounds D 32->128 and N 144->256 (Mosaic alignment the
# easy way), which multiplies both HBM traffic and MXU work ~7x — measured
# slower than plain XLA.  v2 keeps q/k/v packed exactly as the qkv projection
# produces them, (B*nW, N, 3C) with heads living in the lane dimension, so
# the only HBM traffic is one read of qkv and one write of the output; the
# (N, N) attention matrices never leave VMEM.  Per-head lane slices are
# VMEM-local relayouts, which profiling shows are far cheaper than the HBM
# round-trips they replace (dev/profile_components.py: stage-1 W-MSA 7.1ms
# XLA, attention matrices alone ~370MB/block of HBM traffic).
# --------------------------------------------------------------------------


def _attn_kernel_v2(
    qkv_ref, bias_ref, region_ref, o_ref, *, scale, heads, packed=False,
    layout="tall",
):
    """One chunk of G windows, ALL heads.

    qkv: (G, N, 3C) VMEM; bias: (heads, N, N) f32; region: (G, N) int32;
    out: (G, N, C).  Per-head stores go straight into the head's lane
    slice: keeps only one head group's f32 score matrix live at a time (a
    gathered outs-list + concatenate held all of them -> scoped-vmem OOM
    at 16 heads).  Native-dtype operands + f32 accumulation: same
    contraction semantics as the XLA reference path (bf16 runs the MXU at
    full rate; an f32 upcast here measured ~15% slower).
    """
    qkv = qkv_ref[...]
    region = region_ref[...]
    neq = region[:, :, None] != region[:, None, :]  # (G, N, N)
    _heads_attention(
        qkv, bias_ref[...], neq, o_ref,
        scale=scale, heads=heads, cdt=o_ref.dtype, packed=packed,
        layout=layout,
    )


def pallas_window_attention_qkv(
    qkv: jax.Array,  # (B*nW, N, 3C) — the qkv projection output, unsplit
    bias: jax.Array,  # (heads, N, N)
    region: Optional[jax.Array],  # (nW, N) int32 or None (no shift)
    scale: float,
    heads: int,
    window_chunk: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused W-MSA/SW-MSA core: returns (B*nW, N, C) attention output with
    heads re-packed in the lane dim, ready for the output projection."""
    bn, n, c3 = qkv.shape
    c = c3 // 3
    # >=8 windows per chunk (Mosaic sublane rule on the (g, N) region block).
    # Chunk sizes from an on-chip sweep at the 480p Swin-B shapes with the
    # raised VMEM cap below: c128 g=64 (0.74 ms vs 1.38 at g=8), c256 g=16,
    # c512/c1024 g=8 (c1024/32-heads runs 0.33 ms vs ~1.7 ms XLA).
    if window_chunk:
        g = window_chunk
    elif c <= 128:
        g = 64
    elif c <= 256:
        g = 16
    else:
        g = 8
    g = min(g, _round_up(bn, 8))
    bn_pad = _round_up(bn, g)

    qkv_p = jnp.pad(qkv, ((0, bn_pad - bn), (0, 0), (0, 0)))
    if region is None:
        region_full = jnp.zeros((bn_pad, n), jnp.int32)
    else:
        nw = region.shape[0]
        region_full = jnp.tile(region, (bn // nw, 1))
        region_full = jnp.pad(
            region_full, ((0, bn_pad - bn), (0, 0)), constant_values=-1
        )

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_v2, scale=scale, heads=heads,
            packed=_packed_enabled(), layout=_packed_layout(),
        ),
        out_shape=jax.ShapeDtypeStruct((bn_pad, n, c), qkv.dtype),
        grid=(bn_pad // g,),
        in_specs=[
            pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # Mosaic's default 16MB scoped-vmem cap rejects both the larger
        # chunks and the 32-head (c1024) shape; v5e has 128MB of VMEM and
        # the double-buffered working set at g=64/c128 is ~25MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qkv_p, bias.astype(jnp.float32), region_full)
    return out[:bn]


def _qkv_reference(qkv, bias, region, scale, heads):
    """XLA twin of the v2 kernel (also its backward)."""
    bn, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads

    def split(t):  # (bn, n, c) -> (bn, heads, n, d)
        return t.reshape(bn, n, heads, d).transpose(0, 2, 1, 3)

    q, k, v = (split(qkv[..., i * c : (i + 1) * c]) for i in range(3))
    if region is None:
        mask = None
    else:
        neq = region[:, :, None] != region[:, None, :]
        mask = jnp.where(neq, -1e9, 0.0).astype(jnp.float32)
    out = xla_window_attention(q, k, v, bias, mask, scale)
    return out.transpose(0, 2, 1, 3).reshape(bn, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_window_attention_qkv(qkv, bias, region, scale, heads):
    """v2 Pallas forward + XLA-recompute backward.

    qkv: (B*nW, N, 3C); bias: (heads, N, N); region: (nW, N) int32 ids or
    zeros; returns (B*nW, N, C)."""
    return pallas_window_attention_qkv(qkv, bias, region, scale, heads)


def _fused_qkv_fwd(qkv, bias, region, scale, heads):
    out = pallas_window_attention_qkv(qkv, bias, region, scale, heads)
    return out, (qkv, bias, region)


def _fused_qkv_bwd(scale, heads, res, g):
    qkv, bias, region = res
    _, vjp = jax.vjp(
        lambda a, b: _qkv_reference(a, b, region, scale, heads), qkv, bias
    )
    dqkv, dbias = vjp(g)
    return dqkv, dbias, jnp.zeros_like(region)


fused_window_attention_qkv.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


@functools.lru_cache(maxsize=None)
def shift_region_ids(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Per-token shift-region ids, (nW, ws*ws) int32.

    Two tokens in the same window may attend iff their ids match — equivalent
    to the dense mask from shift_window_mask (verified in tests)."""
    img = np.zeros((hp, wp), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    img = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    return img.reshape(-1, ws * ws)


def _heads_attention(
    qkvw, bias, neq, outw_ref, *, scale, heads, cdt, packed, layout="tall",
    typed_mcol=None, typed_nw=0,
):
    """Per-head window attention on a VMEM-resident (G, N, 3C) block,
    writing (G, N, C) into ``outw_ref``.

    packed=False: one K=d dot per head (d = C/heads = 32 for every Swin-B/L
    stage) — the MXU contracts 32 of its 128 K lanes and each band issues
    heads x 2 tiny dots, which measures issue-bound at the late stages
    (16/32 heads, 3-4 windows per band).

    packed=True, layout="tall": process p = 128//d heads per dot via
    block-diagonal Q packing.  For a head group [q_0..q_{p-1}] with
    channels side by side (N, p*d), build Q_bd (p*N, p*d) = tile(q, (p, 1))
    masked so row block h keeps only head h's channel slice; then

        S_tall (p*N, N) = Q_bd @ k_group^T

    computes every head's scores in ONE full-K (=128) contraction (the
    zeroed channels contribute exact 0.0 to the f32 accumulator, so the
    result is bitwise the per-head dot).  Softmax rows are per-(head, query)
    — the natural layout.  The PV dot P_tall (p*N, N) @ v_group (N, p*d)
    computes all p channel slices for each head (p x logical waste but
    fewer MXU passes than p separate K=N dots into d=32-lane outputs);
    the diagonal blocks are extracted with a constant mask + sum over the
    p row blocks (VPU-cheap).  Net at stage-2 shapes: 2 dots per 4 heads
    instead of 8, ~1.6x fewer MXU passes and 4x fewer instructions.

    packed=True, layout="wide" (IR_ADS_SWIN_PACKED=2): heads pack into the
    LANE dim of the scores instead of the sublanes.  Block-diagonalize K
    and V (same selector), so

        S_wide (N, p*N) = q_group (N, p*d) @ K_bd (p*N, p*d)^T

    puts head j's (N, N) scores at lane block j.  Two wins over "tall":
    (1) the score tensor's lane dim is p*N (576 at p=4, ws=12 -> 11% Mosaic
    lane padding) instead of N (144 -> 78% padding), so BOTH attention dots
    run ~1.6x fewer MXU cycles; (2) the PV dot P (N, p*N) @ V_bd (p*N, p*d)
    lands every head's output directly in its channel slice — the tall
    layout's (G, p*N, p*d) f32 extract (mask + reduce over p) disappears.
    Softmax subtracts the per-row max over ALL p segments (softmax is
    shift-invariant per segment, so this is exact) and re-normalizes per
    segment with a denominator computed by one tiny MXU dot against the
    block-diagonal selector; the PV dot consumes unnormalized exp and the
    division happens on the (N, p*d) output.  Numerics: agrees with the
    unpacked path to compute-dtype rounding (not bitwise — exp/normalize
    round in a different order); a head whose entire row sits >~88 logits
    below the global row max underflows to an all-zero output row (guarded
    against 0/0; impossible for LN'd real activations).
    """
    g_, n, c3 = qkvw.shape
    c = c3 // 3
    d = c // heads
    p = 128 // max(d, 1) if d and 128 % d == 0 else 1
    if isinstance(packed, int) and not isinstance(packed, bool):
        p = min(p, packed)  # caller-capped pack factor (VMEM budget)
    while p > 1 and heads % p:
        p //= 2
    # round-4 fused-normalize formulation (IR_ADS_V6_FUSEDNORM, default
    # OFF — measured a LOSS in context): the round-4 knock-out probe
    # (dev/probe_v6_itemize.py) measured the tall layout's per-call VPU
    # overhead as qbd build 0.20 ms + softmax normalize 0.16 ms + output
    # extract 0.14 ms of a 1.12 ms stage-2 call, and this path removes all
    # three structurally — but the whole-model A/B (dev/ablate_full.py,
    # r5 config, B=8 480x640, 2026-08-19) measured 72.75/73.05 ms with it
    # OFF vs 75.94/77.68 ms ON: the sublane-concat Q build and the p
    # masked multiply-adds on the output relayout WORSE than the tile +
    # select they replace.  Kept opt-in (bitwise tests still cover both).
    #   - block-diag Q is built as a sublane concat of p lane-masked copies
    #     where the mask rides the mandatory *scale multiply (no tile +
    #     select over (pN, pd));
    #   - the PV dot consumes UNNORMALIZED bf16 exp scores (no full-size
    #     (pN, N) divide);
    #   - extraction and normalization fuse into p multiply-adds on the
    #     (N, pd) output: o += o_full[block j] * (lane_mask_j / den_j).
    import os as _osf

    # "0" legacy softmax (default) · "1" round-4 concat/lane-mask variant
    # (measured loss, kept for the ledger) · "2" osel-fold: identical to
    # legacy except the softmax divide moves from the RAGGED (pN, N=144)
    # score tile to the 128-lane-aligned (pN, pd) output (o_full * 1/den
    # before the existing osel extract) — the knock-out probe measured the
    # normalize pass at 0.19 ms/call, ~25x its flop count, i.e. layout-
    # bound, not math-bound (dev/probe_v6_itemize.py, 2026-08-19).
    fmode = _osf.environ.get("IR_ADS_V6_FUSEDNORM", "0") or "0"
    fused = fmode == "1"
    # folded-bias mode (neq is None): ``bias`` is a PER-WINDOW
    # (G, heads, N, N) f32 slab with the shift-region mask already added
    # (-1e9 at masked pairs) — built once per call in XLA.  This removes
    # the per-(grid step, head group) neq build + where pass, which the
    # round-3 probe measured at ~2.0 ms of a 2.165 ms shifted stage-0 v4
    # call (dev/probe_r3_stage_kernels.py: shift6 2.165 vs shift0 0.165).
    # typed mode (typed_mcol is not None, BIASMASK=3): ``bias`` is the
    # per-ROW (rows, heads, N, N) bias+rowmask slab for THIS band and
    # typed_mcol the shared (N, N) last-column mask — the bias add stays a
    # row-broadcast (same volume as the plain bias add) and the column
    # mask touches only 1/nwin_w of the scores; no neq/tile/where at all.
    typed = typed_mcol is not None
    folded = neq is None and not typed

    if typed:
        assert layout != "wide" or not packed or p <= 1, (
            "typed bias mode is implemented for the tall/unpacked layouts"
        )
        rows_b = bias.shape[0]
        nw_t = typed_nw
    if packed and p > 1 and heads % p == 0 and layout == "wide":
        pd = p * d
        row_head = jax.lax.broadcasted_iota(jnp.int32, (p * n, pd), 0) // n
        col_head = jax.lax.broadcasted_iota(jnp.int32, (p * n, pd), 1) // d
        sel = row_head == col_head  # (pN, pd) block-diagonal selector
        sel_f = sel.astype(qkvw.dtype)
        if not folded:
            # region mask as an ADDITIVE f32 term, lane-tiled by concat:
            # 3-D bool lane ops (tile/reshape of neq) are Mosaic walls, and
            # the add folds the mask pass into the bias add
            maskf = jnp.where(neq, -1e9, 0.0).astype(jnp.float32)
            maskf_w = (
                maskf if p == 1 else jnp.concatenate([maskf] * p, axis=-1)
            )  # (G, N, pN)
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, pd), 1) // d
        for h0 in range(0, heads, p):
            q = qkvw[:, :, h0 * d : h0 * d + pd]
            k = qkvw[:, :, c + h0 * d : c + h0 * d + pd]
            v = qkvw[:, :, 2 * c + h0 * d : 2 * c + h0 * d + pd]
            if fused:
                # block-diag K/V as sublane concats of lane-masked copies
                # (no (pN, pd) tile + select materialization)
                k_bd = jnp.concatenate(
                    [(k * (lane_head == j).astype(k.dtype)[None])
                     for j in range(p)], axis=1)
                v_bd = jnp.concatenate(
                    [(v * (lane_head == j).astype(v.dtype)[None])
                     for j in range(p)], axis=1)
            else:
                k_bd = jnp.where(
                    sel[None], jnp.tile(k, (1, p, 1)), 0
                ).astype(k.dtype)
                v_bd = jnp.where(
                    sel[None], jnp.tile(v, (1, p, 1)), 0
                ).astype(v.dtype)
            s = jax.lax.dot_general(
                (q * scale).astype(q.dtype), k_bd,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, N, pN) f32 — head j's scores at lanes [j*N, (j+1)*N)
            if folded:
                s = s + jnp.concatenate(
                    [bias[:, h0 + j] for j in range(p)], axis=-1
                )  # (G, N, pN) per-window bias+mask slab slices
            else:
                bias_w = jnp.concatenate(
                    [bias[h0 + j] for j in range(p)], axis=-1
                )  # (N, pN) f32 lane-concat (VMEM-local)
                s = s + (bias_w[None] + maskf_w)
            mx = jnp.max(s, axis=-1, keepdims=True)  # global row max
            ex = jnp.exp(s - mx).astype(v.dtype)
            o_num = jax.lax.dot_general(
                ex, v_bd,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, N, pd) f32 — unnormalized, heads in channel slices
            den = jax.lax.dot_general(
                ex, sel_f,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G, N, pd): per-segment sum broadcast to the head's lanes
            outw_ref[:, :, h0 * d : h0 * d + pd] = (
                o_num / jnp.maximum(den, 1e-30)
            ).astype(cdt)
        return
    if not packed or p <= 1 or heads % p:
        for h in range(heads):
            q = qkvw[:, :, h * d : (h + 1) * d]
            k = qkvw[:, :, c + h * d : c + (h + 1) * d]
            v = qkvw[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
            s = jax.lax.dot_general(
                (q * scale).astype(q.dtype), k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if typed:
                # the last-column mask rides a broadcast select that fuses
                # into the bias-add elementwise chain (Mosaic TC lowers
                # neither scatter-add nor dynamic_slice, so no in-place
                # slice update is possible here)
                is_last = jax.lax.broadcasted_iota(
                    jnp.int32, (1, nw_t, 1, 1), 1
                ) == nw_t - 1
                s4 = s.reshape(rows_b, nw_t, n, n) + bias[:, h][:, None]
                s4 = s4 + jnp.where(
                    is_last, typed_mcol[None, None], 0.0
                )
                s = s4.reshape(g_, n, n)
            elif folded:
                s = s + bias[:, h]
            else:
                s = s + bias[h][None]
                s = jnp.where(neq, s - 1e9, s)
            pr = jax.nn.softmax(s, axis=-1)
            outw_ref[:, :, h * d : (h + 1) * d] = jax.lax.dot_general(
                pr.astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
        return

    pd = p * d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (p * n, pd), 0) // n
    col_head = jax.lax.broadcasted_iota(jnp.int32, (p * n, pd), 1) // d
    sel = row_head == col_head  # (pN, pd) block-diagonal selector
    osel = (
        jax.lax.broadcasted_iota(jnp.int32, (p, 1, pd), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (p, 1, pd), 2) // d
    ).astype(jnp.float32)
    if not folded and not typed:
        neq_t = jnp.tile(neq, (1, p, 1))  # (G, pN, N)
    if typed:
        mcol_t = jnp.concatenate([typed_mcol] * p, axis=0)  # (pN, N)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, pd), 1) // d
    for h0 in range(0, heads, p):
        q = qkvw[:, :, h0 * d : h0 * d + pd]
        k = qkvw[:, :, c + h0 * d : c + h0 * d + pd]
        v = qkvw[:, :, 2 * c + h0 * d : 2 * c + h0 * d + pd]
        if fused:
            # lane-mask rides the mandatory *scale multiply: block-diag Q
            # is a sublane concat of p masked-scaled copies of q
            q_bd = jnp.concatenate(
                [(q * jnp.where(lane_head == j, scale, 0.0)[None]
                  ).astype(q.dtype) for j in range(p)], axis=1)
            s = jax.lax.dot_general(
                q_bd, k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, pN, N) f32
        else:
            q_bd = jnp.where(
                sel[None], jnp.tile(q, (1, p, 1)), 0).astype(q.dtype)
            s = jax.lax.dot_general(
                (q_bd * scale).astype(q.dtype), k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, pN, N) f32
        if typed:
            # row-broadcast bias+rowmask add (same volume as the plain
            # bias add) + the column mask on each row's LAST window only
            bb = bias[:, h0 : h0 + p].reshape(rows_b, p * n, n)
            # broadcast iota-select for the last-column mask: fuses into
            # the bias-add chain (scatter-add / dynamic_slice are Mosaic
            # TC walls, so no in-place slice update is possible)
            is_last = jax.lax.broadcasted_iota(
                jnp.int32, (1, nw_t, 1, 1), 1
            ) == nw_t - 1
            s4 = s.reshape(rows_b, nw_t, p * n, n) + bb[:, None]
            s4 = s4 + jnp.where(is_last, mcol_t[None, None], 0.0)
            s = s4.reshape(g_, p * n, n)
        elif folded:
            # (G, p, N, N) -> (G, pN, N): leading-dim merge into sublanes
            s = s + bias[:, h0 : h0 + p].reshape(g_, p * n, n)
        else:
            s = s + bias[h0 : h0 + p].reshape(p * n, n)[None]
            s = jnp.where(neq_t, s - 1e9, s)
        if fused:
            mx = jnp.max(s, axis=-1, keepdims=True)
            ex = jnp.exp(s - mx)  # f32 (G, pN, N)
            den = jnp.sum(ex, axis=-1, keepdims=True)  # f32 (G, pN, 1)
            o_full = jax.lax.dot_general(
                ex.astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, pN, pd) f32, unnormalized
            r = 1.0 / jnp.maximum(den, 1e-30)
            o = None
            for j in range(p):
                oj = o_full[:, j * n : (j + 1) * n, :]
                rj = r[:, j * n : (j + 1) * n, :]
                term = oj * (rj * (lane_head == j).astype(jnp.float32)[None])
                o = term if o is None else o + term
        elif fmode == "2":
            mx = jnp.max(s, axis=-1, keepdims=True)
            ex = jnp.exp(s - mx)  # f32 (G, pN, N)
            den = jnp.sum(ex, axis=-1, keepdims=True)
            o_full = jax.lax.dot_general(
                ex.astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, pN, pd) f32, unnormalized
            o_full = o_full * (1.0 / jnp.maximum(den, 1e-30))
            o = jnp.sum(o_full.reshape(g_, p, n, pd) * osel[None], axis=1)
        else:
            pr = jax.nn.softmax(s, axis=-1)
            o_full = jax.lax.dot_general(
                pr.astype(v.dtype), v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (G, pN, pd) f32
            o = jnp.sum(o_full.reshape(g_, p, n, pd) * osel[None], axis=1)
        outw_ref[:, :, h0 * d : h0 * d + pd] = o.astype(cdt)


_STAGE_IDX: Optional[int] = None  # trace-time stage context (see below)


def set_stage_idx(i: Optional[int]) -> None:
    """Record the CURRENT Swin stage index at trace time so per-stage env
    lists (IR_ADS_SWIN_PACKED="2,2,1,1") resolve inside the kernel
    wrappers, which have no stage argument.  Set by SwinBlockAdapter right
    before it dispatches to a fused kernel; consumed synchronously within
    that same trace step, so plain module state is safe."""
    global _STAGE_IDX
    _STAGE_IDX = i


def _packed_value() -> str:
    import os

    v = os.environ.get("IR_ADS_SWIN_PACKED", "1")
    if "," in v:
        parts = [p.strip() for p in v.split(",")]
        i = _STAGE_IDX if _STAGE_IDX is not None else 0
        return parts[max(0, min(i, len(parts) - 1))]
    return v


def _packed_enabled() -> bool:
    return _packed_value() not in ("", "0")


def _packed_layout() -> str:
    """IR_ADS_SWIN_PACKED=2 selects the head-minor "wide" score layout
    (see _heads_attention); any other non-zero value keeps "tall".  A
    comma list is keyed by the current stage (set_stage_idx)."""
    return "wide" if _packed_value() == "2" else "tall"


def _biasmask_mode() -> str:
    """IR_ADS_SWIN_BIASMASK selects how the rel-pos bias meets the shift
    mask:

      ''/'0'  in-kernel region compare + where (round-2 default)
      '1'     folded PER-WINDOW bias+mask slab.  MEASURED A LOSS on v5e
              (dev/probe_r3_stage_kernels 2026-08-18: v6 stage-2 shifted
              0.56 ms in-kernel vs 1.0 ms folded — the per-band slab DMA
              cost more than the neq+where passes; v4 stage-0 a wash).
      '2'     round-4 BAND-TYPE slab (v4 path): in a standard Swin shift
              grid every window-row band has the same mask pattern except
              the last (vertical wrap), so the slab is (2, g, heads, N, N)
              selected by index-map arithmetic — it stays VMEM-resident
              across bands instead of streaming a fresh 4-6 MB block per
              band, and the kernel runs the same single-add folded branch.
      '3'     round-5 WINDOW-TYPE decomposition (v4 path): the shift mask
              decomposes exactly into (per-window-ROW base) + (one shared
              last-COLUMN extra) — verified in numpy at trace time from
              the static geometry (_typed_mask_parts).  The kernel then
              adds a tiny (2, rows, heads, N, N) bias+rowmask slab (band-
              selected like '2' but ROW-sized, not window-sized) plus one
              (N, N) column mask on each row's last window.  No neq build,
              no tile, no where — the masked-entry arithmetic (+-1e9 adds)
              underflows in exp exactly like the legacy where path, so
              softmax outputs are bitwise identical.
    """
    import os

    v = os.environ.get("IR_ADS_SWIN_BIASMASK", "0")
    return "" if v in ("", "0") else v


def _biasmask_enabled() -> bool:
    return _biasmask_mode() != ""


def _mask8_enabled() -> str:
    """IR_ADS_SWIN_MASK8 selects a PRECOMPUTED neq mask operand instead of
    the in-kernel region-id compare.  The round-3 probe charged ~2.0 ms of
    the 2.165 ms shifted stage-0 v4 call to the in-kernel
    ``region[:, :, None] != region[:, None, :]`` build — a lane-broadcast
    of an int vector, which Mosaic lowers as relayout passes.  The mask
    depends only on static window geometry, so it can be built once in XLA
    (fused, free) and DMA'd: (nW, N, N) int8 is 16x smaller than the
    folded f32 bias slab that measured a loss.  '1'/'8' = int8 operand,
    '32' = int32 (fallback if Mosaic dislikes 8-bit VMEM compares),
    '' / '0' = off (round-2 in-kernel compare)."""
    import os

    v = os.environ.get("IR_ADS_SWIN_MASK8", "0")
    if v in ("", "0"):
        return ""
    return "i32" if v == "32" else "i8"


def _neq_mask(region_full: jax.Array, kind: str) -> jax.Array:
    """(nW, N) region ids -> (nW, N, N) neq mask in i8/i32 (1 = masked)."""
    neq = region_full[:, :, None] != region_full[:, None, :]
    return neq.astype(jnp.int8 if kind == "i8" else jnp.int32)


@functools.lru_cache(maxsize=None)
def _typed_mask_parts(hp, wp, ws, shift, rows_per_step):
    """Window-TYPE decomposition of the shift mask (BIASMASK=3).

    In a standard Swin shift grid only the wrap row/column windows carry a
    mask; concretely the per-window neq mask decomposes as

        mask[row R, col C] == base[R]  |  (col_extra if C == last else 0)

    with base[R] identical for every non-wrap row.  This is VERIFIED here
    in numpy (static geometry, trace time); returns None when the
    decomposition doesn't hold (then callers fall back to the legacy
    in-kernel compare) else (base (nwin_h, N, N) bool, col_extra (N, N)
    bool).  Requires the per-band slab trick's band structure: all bands
    except the last share one row pattern."""
    r = shift_region_ids(hp, wp, ws, shift)  # (nW, n) numpy
    nwin_h, nwin_w = hp // ws, wp // ws
    n = ws * ws
    neq = (r[:, :, None] != r[:, None, :]).reshape(nwin_h, nwin_w, n, n)
    base = neq[:, 0]  # (nwin_h, n, n)
    if nwin_w > 1 and not (neq[:, :-1] == base[:, None]).all():
        return None
    col = neq[0, -1] & ~base[0]
    if not ((base | col[None]) == neq[:, -1]).all():
        return None
    if nwin_h % rows_per_step:
        return None
    nb = nwin_h // rows_per_step
    rows_t = base.reshape(nb, rows_per_step, n, n)
    if nb > 1 and not (rows_t[:-1] == rows_t[0]).all():
        return None
    return base, col


def _fold_bias_region(bias: jax.Array, region_full: jax.Array) -> jax.Array:
    """(heads, N, N) rel-pos bias + (nW, N) shift-region ids ->
    (nW, heads, N, N) f32 slab with -1e9 added at masked pairs.

    Built ONCE per kernel call in XLA and fed as an operand; the kernels
    then add it in a single pass instead of re-deriving the mask per grid
    step (neq build + where on the f32 scores), which the round-3 probe
    measured at ~2.0 of the 2.165 ms shifted stage-0 v4 call.  Unmasked
    entries are bitwise the old path (mask contributes +0.0); masked
    entries differ by f32 associativity under the -1e9, which softmax
    flushes to 0 either way."""
    neq = region_full[:, :, None] != region_full[:, None, :]
    mask = jnp.where(neq, -1e9, 0.0).astype(jnp.float32)
    return bias.astype(jnp.float32)[None] + mask[:, None]


# --------------------------------------------------------------------------
# v3 kernel: window partition/reverse folded into the kernel (map layout).
#
# The v2 kernel still pays two XLA layout passes per attention call:
# window_partition before and window_reverse after — measured ~1.8 ms/call
# at stage-1 480p shapes vs a ~0.4 ms traffic bound (HBM round trips with
# transpose-unfriendly access patterns).  v3 consumes the qkv MAP
# (B, Hp, Wp, 3C) directly: each grid step reads a band of window rows, does
# the partition as a VMEM-local relayout (~1us, vs ms-scale in HBM), runs
# the same per-head attention as v2, and un-partitions on the way out.
# Cyclic shift (roll) stays in XLA on the C-wide input map — cheap and
# exact; padding stays in XLA too.
# --------------------------------------------------------------------------


def _attn_kernel_v3(
    qkv_ref, bias_ref, region_ref, o_ref, outw_ref, *, scale, heads, ws,
    nwin_w, packed=False, layout="tall",
):
    """One band of window rows, ALL heads.

    qkv: (1, rows*ws, Wp, 3C) VMEM; bias: (heads, N, N) f32;
    region: (rows*nwin_w, N) int32; out: (1, rows*ws, Wp, C);
    outw_ref: (G, N, C) VMEM scratch (per-head lane-slice writes).
    """
    qkv = qkv_ref[0]
    rh, wp, c3 = qkv.shape
    rows = rh // ws
    n = ws * ws
    c = c3 // 3
    d = c // heads
    # VMEM-local window partition (the whole point of v3)
    qkvw = (
        qkv.reshape(rows, ws, nwin_w, ws, c3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * nwin_w, n, c3)
    )
    # region arrives pre-banded as (n_bands, g, N): the block covers dims
    # (g, N) fully, satisfying Mosaic's block-divisibility rule for any g
    region = region_ref[0]
    neq = region[:, :, None] != region[:, None, :]  # (G, N, N)
    _heads_attention(
        qkvw, bias_ref[...], neq, outw_ref,
        scale=scale, heads=heads, cdt=o_ref.dtype, packed=packed,
        layout=layout,
    )
    # VMEM-local window reverse
    o_ref[0] = (
        outw_ref[...]
        .reshape(rows, nwin_w, ws, ws, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rh, wp, c)
    )


def pallas_window_attention_map(
    qkv: jax.Array,  # (B, Hp, Wp, 3C) — qkv projection of the (rolled) map
    bias: jax.Array,  # (heads, N, N)
    region: Optional[jax.Array],  # (nW, N) int32 or None (no shift)
    scale: float,
    heads: int,
    ws: int,
    rows_per_step: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused W-MSA/SW-MSA on the map layout: returns (B, Hp, Wp, C)."""
    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    n = ws * ws
    nwin_h, nwin_w = hp // ws, wp // ws
    if rows_per_step is None:
        import os

        ov = os.environ.get("IR_ADS_SWIN_V3_ROWS", "")
        if ov:
            # forced band size (compile-time experiments): largest divisor
            # of nwin_h not exceeding the requested value
            want = int(ov)
            rows_per_step = max(
                c for c in range(1, nwin_h + 1)
                if nwin_h % c == 0 and c <= want
            )
        else:
            # Budget: f32 score matrix per head (G, N, N) <= ~12 MB plus
            # the double-buffered qkv band; whole image when it fits.
            for cand in range(nwin_h, 0, -1):
                if nwin_h % cand:
                    continue
                g = cand * nwin_w
                if g * n * n * 4 <= 12 * 1024 * 1024:
                    rows_per_step = cand
                    break
            else:
                rows_per_step = 1
    assert hp % (rows_per_step * ws) == 0, (hp, rows_per_step, ws)
    g = rows_per_step * nwin_w

    if region is None:
        region_full = jnp.zeros((nwin_h * nwin_w, n), jnp.int32)
    else:
        region_full = region
    n_bands = nwin_h // rows_per_step
    region_banded = region_full.reshape(n_bands, g, n)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_v3, scale=scale, heads=heads, ws=ws, nwin_w=nwin_w,
            packed=_packed_enabled(), layout=_packed_layout(),
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), qkv.dtype),
        grid=(b, nwin_h // rows_per_step),
        in_specs=[
            pl.BlockSpec(
                (1, rows_per_step * ws, wp, c3),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (heads, n, n), lambda i, j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, g, n), lambda i, j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # this band's region ids, (1, g, N) covers dims fully
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_step * ws, wp, c),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((g, n, c), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qkv, bias.astype(jnp.float32), region_banded)
    return out


def _map_reference(qkv, bias, region, scale, heads, ws):
    """XLA twin of the v3 kernel (also its backward)."""
    from ir_ads_tpu.ops.window_attention import (
        window_partition,
        window_reverse,
    )

    b, hp, wp, c3 = qkv.shape
    c = c3 // 3
    wins = window_partition(qkv, ws)  # (B*nW, N, 3C)
    out = _qkv_reference(wins, bias, region, scale, heads)
    return window_reverse(out, ws, hp, wp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_window_attention_map(qkv, bias, region, scale, heads, ws):
    """v3 Pallas forward + XLA-recompute backward.

    qkv: (B, Hp, Wp, 3C); bias: (heads, N, N); region: (nW, N) int32 ids or
    None; returns (B, Hp, Wp, C)."""
    return pallas_window_attention_map(qkv, bias, region, scale, heads, ws)


def _fused_map_fwd(qkv, bias, region, scale, heads, ws):
    out = pallas_window_attention_map(qkv, bias, region, scale, heads, ws)
    return out, (qkv, bias, region)


def _fused_map_bwd(scale, heads, ws, res, g):
    qkv, bias, region = res
    _, vjp = jax.vjp(
        lambda a, b: _map_reference(a, b, region, scale, heads, ws), qkv, bias
    )
    dqkv, dbias = vjp(g)
    dregion = None if region is None else jnp.zeros_like(region)
    return dqkv, dbias, dregion


fused_window_attention_map.defvjp(_fused_map_fwd, _fused_map_bwd)


# --------------------------------------------------------------------------
# v4 kernel: the whole attention half-block in one HBM pass.
#
#   y = x + proj(window_attention(qkv(LN1(x))))
#
# v3 still pays the LN1 read/write, the qkv projection's read C / write 3C,
# the proj read/write and the residual's two reads + write in XLA — ~13
# C-map HBM passes per block around a kernel that itself only needs 2.
# v4 reads the (rolled, padded) x band once, runs LN1 (f32 stats), the qkv
# matmul, the VMEM window partition, per-head attention, reverse, the out
# projection and the residual add entirely in VMEM, and writes y once.
# Weights use constant index maps so Mosaic keeps them resident across
# bands.  Cyclic shift (roll) and edge padding stay in XLA: a roll is not
# expressible as a Pallas block index map, and it is 2 passes, not 13.
#
# Numerics: LN statistics and both matmul accumulations in f32; rounding
# points match the unfused path (LN output cast to the compute dtype, qkv
# rounded where nn.Dense produces it, attention probabilities cast to the
# value dtype, proj accumulated in f32).  Eval-path only; backward is XLA
# recompute of the reference twin.
# --------------------------------------------------------------------------


def _attn_kernel_v4(
    x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
    region_ref, o_ref, outw_ref, *, eps, scale, heads, ws, nwin_w,
    hp, h_real, w_real, shift, packed=False, layout="tall", folded=False,
    mask8=False,
):
    """One band of window rows, all heads.

    x: (1, rows*ws, Wp, C); g/b: (1, C) LN1; wqkv: (C, 3C); bqkv: (1, 3C);
    wp: (C, C); bp: (1, C); bias: (heads, N, N) f32 — or, when ``folded``,
    the per-window (1, G, heads, N, N) bias+mask slab (region_ref unused);
    region: (1, G, N) int32 — or, when ``mask8``, the PREBUILT neq mask
    (1, G, N, N) i8/i32 (see _mask8_enabled); out: (1, rows*ws, Wp, C);
    outw_ref: (G, N, C) VMEM scratch.

    hp/h_real/w_real/shift: static pad/roll geometry.  The module path runs
    LN1 BEFORE padding, so padded positions enter attention as exact zeros
    (their qkv is then just the qkv bias).  Here x arrives padded+rolled,
    so LN1(0) would leak beta*Wqkv into padded keys — instead the LN output
    is zeroed at positions that are padding in the original map, located
    via static index arithmetic (a rolled col c is padding iff
    (c + shift) mod Wp >= w_real, same for rows with the band offset).
    """
    x = x_ref[0]  # (rh, wp, C)
    rh, wpx, c = x.shape
    rows = rh // ws
    n = ws * ws
    d = c // heads
    cdt = wqkv_ref.dtype

    # LN1 on the flattened band (f32 statistics)
    xf = x.reshape(rh * wpx, c).astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    if h_real != hp or w_real != wpx:
        # Build the pad mask directly at (rh*wpx, 1): reshaping a (rh, wpx)
        # i1 vector to (rh*wpx, 1) is an unsupported Mosaic shape cast (a
        # lane-collapsing bool relayout — the one op that killed the whole
        # r3 bench config), but a flat iota + div/mod needs no reshape.
        j = pl.program_id(1)
        f = jax.lax.broadcasted_iota(jnp.int32, (rh * wpx, 1), 0)
        row = j * rh + f // wpx
        col = f % wpx
        pad = jnp.logical_or(
            (row + shift) % hp >= h_real, (col + shift) % wpx >= w_real
        )
        xn = jnp.where(pad, 0.0, xn)
    xn = xn.astype(cdt)

    # qkv projection (MXU, f32 accumulation), rounded like nn.Dense output
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(cdt)

    # VMEM window partition (same relayout as v3)
    qkvw = (
        qkv.reshape(rows, ws, nwin_w, ws, 3 * c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * nwin_w, n, 3 * c)
    )
    if folded == "typed":
        # bias_ref: (1, rows, heads, N, N) band slab; region_ref slot
        # carries the shared (N, N) f32 column mask (no region ids at all)
        _heads_attention(
            qkvw, bias_ref[0], None, outw_ref,
            scale=scale, heads=heads, cdt=cdt, packed=packed, layout=layout,
            typed_mcol=region_ref[...], typed_nw=nwin_w,
        )
    elif folded:
        _heads_attention(
            qkvw, bias_ref[0], None, outw_ref,
            scale=scale, heads=heads, cdt=cdt, packed=packed, layout=layout,
        )
    else:
        if mask8:
            neq = region_ref[0] != 0  # prebuilt (G, N, N) mask
        else:
            region = region_ref[0]
            neq = region[:, :, None] != region[:, None, :]  # (G, N, N)
        _heads_attention(
            qkvw, bias_ref[...], neq, outw_ref,
            scale=scale, heads=heads, cdt=cdt, packed=packed, layout=layout,
        )
    # VMEM window reverse -> (rh*wp, C)
    att = (
        outw_ref[...]
        .reshape(rows, nwin_w, ws, ws, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rh * wpx, c)
    )
    # out projection + residual
    out = jax.lax.dot_general(
        att, wp_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[...].astype(jnp.float32)
    o_ref[0] = (xf + out).astype(o_ref.dtype).reshape(rh, wpx, c)


def _attn_kernel_v4_int8(
    x_ref, g_ref, b_ref, wqkv_ref, sqkv_ref, bqkv_ref, wp_ref, sp_ref,
    bp_ref, bias_ref, region_ref, o_ref, outw_ref, *, eps, scale, heads,
    ws, nwin_w, hp, h_real, w_real, shift, packed=False, layout="tall",
):
    """w8a8 variant of the v4 half-block: the qkv and out projections run
    s8 x s8 -> s32 on the MXU; attention itself stays in the compute dtype
    (its operands are small and bias/softmax are f32 anyway).  Weights
    arrive pre-quantized per output channel; activations quantize per row
    in VMEM (dynamic abs-max, exact to factor out)."""
    x = x_ref[0]
    rh, wpx, c = x.shape
    rows = rh // ws
    n = ws * ws
    cdt = o_ref.dtype

    xf = x.reshape(rh * wpx, c).astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    if h_real != hp or w_real != wpx:
        j = pl.program_id(1)
        f = jax.lax.broadcasted_iota(jnp.int32, (rh * wpx, 1), 0)
        row = j * rh + f // wpx
        col = f % wpx
        pad = jnp.logical_or(
            (row + shift) % hp >= h_real, (col + shift) % wpx >= w_real
        )
        xn = jnp.where(pad, 0.0, xn)
    xn = xn.astype(cdt).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xn), axis=1, keepdims=True), 1e-12) / 127.0
    xq = jnp.round(xn / sx).astype(jnp.int8)
    qkv = jax.lax.dot_general(
        xq, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sx * sqkv_ref[...].astype(jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(cdt)

    qkvw = (
        qkv.reshape(rows, ws, nwin_w, ws, 3 * c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * nwin_w, n, 3 * c)
    )
    region = region_ref[0]
    neq = region[:, :, None] != region[:, None, :]
    _heads_attention(
        qkvw, bias_ref[...], neq, outw_ref,
        scale=scale, heads=heads, cdt=cdt, packed=packed, layout=layout,
    )
    att = (
        outw_ref[...]
        .reshape(rows, nwin_w, ws, ws, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rh * wpx, c)
    ).astype(jnp.float32)
    sa = jnp.maximum(jnp.max(jnp.abs(att), axis=1, keepdims=True), 1e-12) / 127.0
    aq = jnp.round(att / sa).astype(jnp.int8)
    out = jax.lax.dot_general(
        aq, wp_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sa * sp_ref[...].astype(jnp.float32)
    out = out + bp_ref[...].astype(jnp.float32)
    o_ref[0] = (xf + out).astype(o_ref.dtype).reshape(rh, wpx, c)


def pallas_window_block(
    x: jax.Array,          # (B, Hp, Wp, C) rolled/padded map
    ln_scale: jax.Array,   # (C,)
    ln_bias: jax.Array,    # (C,)
    wqkv: jax.Array,       # (C, 3C)
    bqkv: jax.Array,       # (3C,)
    wproj: jax.Array,      # (C, C)
    bproj: jax.Array,      # (C,)
    bias: jax.Array,       # (heads, N, N)
    region: Optional[jax.Array],  # (nW, N) int32 or None
    scale: float,
    heads: int,
    ws: int,
    h_real: Optional[int] = None,
    w_real: Optional[int] = None,
    shift: int = 0,
    eps: float = 1e-5,
    rows_per_step: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """v4: fused LN1 + qkv + W/SW-MSA + proj + residual on the map layout."""
    import os

    interpret = interpret or os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1"
    b, hp, wpx, c = x.shape
    h_real = hp if h_real is None else h_real
    w_real = wpx if w_real is None else w_real
    n = ws * ws
    nwin_h, nwin_w = hp // ws, wpx // ws
    if rows_per_step is None:
        import os

        want = int(os.environ.get("IR_ADS_SWIN_V4_ROWS", "2"))
        rows_per_step = max(
            cd for cd in range(1, nwin_h + 1)
            if nwin_h % cd == 0 and cd <= want
        )
    g = rows_per_step * nwin_w

    if region is None:
        region_full = jnp.zeros((nwin_h * nwin_w, n), jnp.int32)
    else:
        region_full = region
    n_bands = nwin_h // rows_per_step
    region_banded = region_full.reshape(n_bands, g, n)

    cdt = x.dtype
    vec = lambda v: v.reshape(1, -1).astype(cdt)  # noqa: E731

    def wspec(*shape):
        return pl.BlockSpec(
            shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    from ir_ads_tpu.ops.int8 import int8_enabled

    if int8_enabled():
        from ir_ads_tpu.ops.pallas_mlp import quantize_weight

        wq, sq = quantize_weight(wqkv)
        wp_q, sp = quantize_weight(wproj)
        out = pl.pallas_call(
            functools.partial(
                _attn_kernel_v4_int8, eps=eps, scale=scale, heads=heads,
                ws=ws, nwin_w=nwin_w, hp=hp, h_real=h_real, w_real=w_real,
                shift=shift, packed=_packed_enabled(),
                layout=_packed_layout(),
            ),
            out_shape=jax.ShapeDtypeStruct((b, hp, wpx, c), x.dtype),
            grid=(b, n_bands),
            in_specs=[
                pl.BlockSpec(
                    (1, rows_per_step * ws, wpx, c),
                    lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                wspec(1, c), wspec(1, c),
                wspec(c, 3 * c), wspec(1, 3 * c), wspec(1, 3 * c),
                wspec(c, c), wspec(1, c), wspec(1, c),
                wspec(heads, n, n),
                pl.BlockSpec(
                    (1, g, n), lambda i, j: (j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, rows_per_step * ws, wpx, c),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((g, n, c), x.dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            x, vec(ln_scale), vec(ln_bias),
            wq, sq, vec(bqkv), wp_q, sp, vec(bproj),
            bias.astype(jnp.float32), region_banded,
        )
        return out

    bm_mode = _biasmask_mode() if region is not None else ""
    if bm_mode == "3":
        # window-TYPE decomposition: valid only when the region ids are the
        # standard shift grid for this (static) geometry and the layout is
        # tall/unpacked; falls back to the legacy in-kernel compare else.
        parts = (
            _typed_mask_parts(hp, wpx, ws, shift, rows_per_step)
            if shift > 0 else None
        )
        if parts is None or (
            _packed_enabled() and _packed_layout() == "wide"
        ):
            bm_mode = ""
    folded = bool(bm_mode)
    if bm_mode == "3":
        base, colx = parts
        nwh = hp // ws
        # (2, rows, N, N) bool: [normal-band rows, last-band rows]
        slab_np = np.stack(
            [base[:rows_per_step], base[nwh - rows_per_step :]]
        ).astype(np.float32) * np.float32(-1e9)
        bias_arg = (
            bias.astype(jnp.float32)[None, None]
            + jnp.asarray(slab_np)[:, :, None]
        )  # (2, rows, heads, N, N)
        bias_spec = pl.BlockSpec(
            (1, rows_per_step, heads, n, n),
            lambda i, j, nb=n_bands: ((j + 1) // nb, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        folded = "typed"
    elif bm_mode == "2":
        # band-TYPE slab: every band shares the first band's mask pattern
        # except the last (vertical wrap row).  (2, g, heads, n, n) stays
        # VMEM-resident (same block id for bands 0..n-2).
        region_2 = jnp.stack(
            [region_banded[0], region_banded[n_bands - 1]]
        ).reshape(2 * g, n)
        slab = _fold_bias_region(bias, region_2).reshape(
            2, g, heads, n, n
        )
        bias_arg = slab
        bias_spec = pl.BlockSpec(
            (1, g, heads, n, n),
            lambda i, j, nb=n_bands: ((j + 1) // nb, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    elif folded:
        slab = _fold_bias_region(bias, region_full).reshape(
            n_bands, g, heads, n, n
        )
        bias_arg = slab
        bias_spec = pl.BlockSpec(
            (1, g, heads, n, n), lambda i, j: (j, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        bias_arg = bias.astype(jnp.float32)
        bias_spec = wspec(heads, n, n)

    mask_kind = _mask8_enabled() if (region is not None and not folded) else ""
    if folded == "typed":
        # region slot repurposed: the shared (N, N) f32 last-column mask
        region_arg = jnp.asarray(colx.astype(np.float32) * np.float32(-1e9))
        region_spec = wspec(n, n)
    elif mask_kind:
        region_arg = _neq_mask(region_full, mask_kind).reshape(
            n_bands, g, n, n
        )
        region_spec = pl.BlockSpec(
            (1, g, n, n), lambda i, j: (j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        region_arg = region_banded
        region_spec = pl.BlockSpec(
            (1, g, n), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_v4, eps=eps, scale=scale, heads=heads, ws=ws,
            nwin_w=nwin_w, hp=hp, h_real=h_real, w_real=w_real, shift=shift,
            packed=_packed_enabled(), layout=_packed_layout(), folded=folded,
            mask8=bool(mask_kind),
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wpx, c), x.dtype),
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec(
                (1, rows_per_step * ws, wpx, c),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec(1, c), wspec(1, c),
            wspec(c, 3 * c), wspec(1, 3 * c),
            wspec(c, c), wspec(1, c),
            bias_spec,
            region_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_step * ws, wpx, c),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((g, n, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, vec(ln_scale), vec(ln_bias),
        wqkv.astype(cdt), vec(bqkv), wproj.astype(cdt), vec(bproj),
        bias_arg, region_arg,
    )
    return out


# --------------------------------------------------------------------------
# v5 kernel: the WHOLE padded map per grid step — pad, cyclic roll, crop and
# both projections fold into the kernel.
#
# v4 still leaves pad / roll / un-roll / slice in XLA: 2-6 full-map HBM
# materializations per block (the SW-MSA roll alone is 4).  At 480p every
# stage's padded map + qkv + packed scores fit VMEM (~70 MB worst case at
# stage 0 with pack=2), so v5 reads the REAL (unpadded) map once, runs
# LN1 -> zero-pad -> roll -> qkv -> window attention -> reverse -> un-roll
# -> crop -> out-projection -> residual entirely in VMEM, and writes the
# real map once: 2 HBM passes per attention half-block, total.
#
# Exactness: the module path LNs BEFORE padding, so in-kernel zero-padding
# after LN reproduces it exactly (no pad-mask needed, unlike v4); proj is
# per-token so crop-before-proj == proj-before-crop.
# --------------------------------------------------------------------------


def _attn_kernel_v5(
    x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
    region_ref, o_ref, outw_ref, *, eps, scale, heads, ws, shift, hp, wp,
    pack, layout="tall", folded=False, mask8=False,
):
    """Grid: (B,).  x/o: (1, H, W, C) REAL maps; outw: (nW, N, C) scratch.
    ``folded``: bias_ref is the (nW, heads, N, N) bias+mask slab.
    ``mask8``: region_ref is the prebuilt (nW, N, N) i8/i32 neq mask."""
    x = x_ref[0]  # (H, W, C)
    h_, w_, c = x.shape
    n = ws * ws
    nwin_w = wp // ws
    cdt = wqkv_ref.dtype

    xf = x.reshape(h_ * w_, c).astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    xn = xn.astype(cdt).reshape(h_, w_, c)
    # zero-pad to window multiples (module semantics: pad AFTER norm1)
    if wp != w_:
        xn = jnp.concatenate(
            [xn, jnp.zeros((h_, wp - w_, c), cdt)], axis=1
        )
    if hp != h_:
        xn = jnp.concatenate(
            [xn, jnp.zeros((hp - h_, wp, c), cdt)], axis=0
        )
    # cyclic shift (VMEM concat instead of an XLA roll round-trip)
    if shift:
        xn = jnp.concatenate([xn[shift:], xn[:shift]], axis=0)
        xn = jnp.concatenate([xn[:, shift:], xn[:, :shift]], axis=1)

    qkv = jax.lax.dot_general(
        xn.reshape(hp * wp, c), wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(cdt)

    qkvw = (
        qkv.reshape(hp // ws, ws, nwin_w, ws, 3 * c)
        .transpose(0, 2, 1, 3, 4)
        .reshape((hp // ws) * nwin_w, n, 3 * c)
    )
    if folded == "typed":
        # bias_ref: (nwin_h, heads, N, N) per-row slab; region slot holds
        # the shared (N, N) f32 last-column mask
        _heads_attention(
            qkvw, bias_ref[...], None, outw_ref,
            scale=scale, heads=heads, cdt=cdt, packed=pack, layout=layout,
            typed_mcol=region_ref[...], typed_nw=nwin_w,
        )
    elif folded:
        _heads_attention(
            qkvw, bias_ref[...], None, outw_ref,
            scale=scale, heads=heads, cdt=cdt, packed=pack, layout=layout,
        )
    else:
        if mask8:
            neq = region_ref[...] != 0  # prebuilt (nW, N, N) mask
        else:
            region = region_ref[...]
            neq = region[:, :, None] != region[:, None, :]  # (nW, N, N)
        _heads_attention(
            qkvw, bias_ref[...], neq, outw_ref,
            scale=scale, heads=heads, cdt=cdt, packed=pack, layout=layout,
        )
    att = (
        outw_ref[...]
        .reshape(hp // ws, nwin_w, ws, ws, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(hp, wp, c)
    )
    if shift:  # inverse roll
        att = jnp.concatenate([att[hp - shift:], att[:hp - shift]], axis=0)
        att = jnp.concatenate(
            [att[:, wp - shift:], att[:, :wp - shift]], axis=1
        )
    att = att[:h_, :w_].reshape(h_ * w_, c)  # crop, then project
    out = jax.lax.dot_general(
        att, wp_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[...].astype(jnp.float32)
    o_ref[0] = (xf + out).astype(o_ref.dtype).reshape(h_, w_, c)


def _attn_kernel_v6(
    x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
    region_ref, g2_ref, b2_ref, w1_ref, b1_ref, w2_ref, b2f_ref,
    aw1_ref, ab1_ref, aw2_ref, ab2_ref, o_ref, outw_ref, *,
    eps, scale, heads, ws, shift, hp, wp, pack, adapter_scale,
    layout="tall", folded=False, mask8=False,
):
    """v6 = v5 + the block tail: the ENTIRE Swin block (LN1 + qkv + W/SW-MSA
    + proj + residual + LN2 + FFN + adapter + residual) in one kernel — one
    HBM read of the real x map, one write of the real block output.  The
    FFN hidden is processed in row chunks so its f32 (rows, 4C) buffer
    stays bounded regardless of map size."""
    x = x_ref[0]  # (H, W, C)
    h_, w_, c = x.shape
    n = ws * ws
    nwin_w = wp // ws
    cdt = wqkv_ref.dtype

    xf = x.reshape(h_ * w_, c).astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    xn = xn.astype(cdt)

    # qkv formulation knob (IR_ADS_V6_QKV): 'real' projects only the real
    # tokens and pads the qkv OUTPUT with the bias row — dot(0, W) + b == b,
    # so it is bitwise the padded form while skipping 44% dead qkv FLOPs at
    # stage 2 (36x48 vs 30x40) and 92% at stage 3 (24x24 vs 15x20).
    # 'padded' zero-pads the normalized map FIRST and projects the padded
    # grid (the pre-r3 form).  Both are kept because Mosaic's lowering of
    # the post-projection 3C-wide pad/roll concats is a measured variable.
    import os as _os0

    v6_qkv = _os0.environ.get("IR_ADS_V6_QKV", "real")
    if v6_qkv == "real":
        qkv = jax.lax.dot_general(
            xn.reshape(h_ * w_, c), wqkv_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[...].astype(jnp.float32)
        qkv = qkv.astype(cdt).reshape(h_, w_, 3 * c)
        bpad = bqkv_ref[...].astype(cdt).reshape(1, 1, 3 * c)
        if wp != w_:
            qkv = jnp.concatenate(
                [qkv, jnp.broadcast_to(bpad, (h_, wp - w_, 3 * c))], axis=1
            )
        if hp != h_:
            qkv = jnp.concatenate(
                [qkv, jnp.broadcast_to(bpad, (hp - h_, wp, 3 * c))], axis=0
            )
        if shift:
            qkv = jnp.concatenate([qkv[shift:], qkv[:shift]], axis=0)
            qkv = jnp.concatenate([qkv[:, shift:], qkv[:, :shift]], axis=1)
    else:
        xp = xn.reshape(h_, w_, c)
        if wp != w_:
            xp = jnp.concatenate([xp, jnp.zeros((h_, wp - w_, c), cdt)], axis=1)
        if hp != h_:
            xp = jnp.concatenate([xp, jnp.zeros((hp - h_, wp, c), cdt)], axis=0)
        if shift:
            xp = jnp.concatenate([xp[shift:], xp[:shift]], axis=0)
            xp = jnp.concatenate([xp[:, shift:], xp[:, :shift]], axis=1)
        qkv = jax.lax.dot_general(
            xp.reshape(hp * wp, c), wqkv_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[...].astype(jnp.float32)
        qkv = qkv.astype(cdt)
    qkvw = (
        qkv.reshape(hp // ws, ws, nwin_w, ws, 3 * c)
        .transpose(0, 2, 1, 3, 4)
        .reshape((hp // ws) * nwin_w, n, 3 * c)
    )
    if folded == "typed":
        # bias_ref: (nwin_h, heads, N, N) per-row slab; region slot holds
        # the shared (N, N) f32 last-column mask
        _heads_attention(
            qkvw, bias_ref[...], None, outw_ref,
            scale=scale, heads=heads, cdt=cdt, packed=pack, layout=layout,
            typed_mcol=region_ref[...], typed_nw=nwin_w,
        )
    elif folded:
        _heads_attention(
            qkvw, bias_ref[...], None, outw_ref,
            scale=scale, heads=heads, cdt=cdt, packed=pack, layout=layout,
        )
    else:
        if mask8:
            neq = region_ref[...] != 0  # prebuilt (nW, N, N) mask
        else:
            region = region_ref[...]
            neq = region[:, :, None] != region[:, None, :]
        _heads_attention(
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
            [att[:, wp - shift:], att[:, :wp - shift]], axis=1
        )
    att = att[:h_, :w_].reshape(h_ * w_, c)
    y = xf + (
        jax.lax.dot_general(
            att, wp_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bp_ref[...].astype(jnp.float32)
    )  # (HW, C) f32 — the attention-half residual

    # ---- block tail (same math as ops/pallas_mlp._tail_kernel), chunked --
    # Chunk size trades f32 hidden-buffer VMEM against MXU/VPU overlap:
    # with >1 chunk, chunk i's GELU (transcendental VPU work, ~20 slots/
    # element) can overlap chunk i+1's FFN dot in Mosaic's schedule.  All
    # tail ops are row-wise, so any chunking is bitwise-identical.
    import os as _os

    hw = h_ * w_
    chunk = int(_os.environ.get("IR_ADS_V6_CHUNK", "0") or 0)
    if chunk <= 0:
        chunk = 2048
    chunk = min(chunk, hw)
    outs = []
    for r0 in range(0, hw, chunk):
        r1 = min(r0 + chunk, hw)
        yb = y[r0:r1]
        mu2 = jnp.mean(yb, axis=1, keepdims=True)
        yc = yb - mu2
        var2 = jnp.mean(yc * yc, axis=1, keepdims=True)
        yn = yc * jax.lax.rsqrt(var2 + eps)
        yn = (
            yn * g2_ref[...].astype(jnp.float32)
            + b2_ref[...].astype(jnp.float32)
        ).astype(cdt)
        hdn = jax.lax.dot_general(
            yn, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...].astype(jnp.float32)
        hdn = jax.nn.gelu(hdn, approximate=True).astype(cdt)
        ffn = jax.lax.dot_general(
            hdn, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2f_ref[...].astype(jnp.float32)
        # adapter weights may arrive with a leading per-stream block dim
        # (dual mode: BlockSpec index map selects rgb/dte by grid step)
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


def _wholemap_bias_region(
    bias, region, region_full, hp, wp, ws, shift, heads, n, nw, pack, wspec
):
    """Shared v5/v6 whole-map bias/mask operand setup, including the
    round-5 BIASMASK=3 window-TYPE decomposition (rows_per_step=1: the
    per-window-row slab needs no band index map in a whole-map kernel).
    Returns (bias_arg, bias_spec, region_arg, region_spec, folded,
    mask_kind) where folded is False | True | "typed"."""
    bm = _biasmask_mode() if region is not None else ""
    typed_parts = None
    if bm == "3":
        typed_parts = (
            _typed_mask_parts(hp, wp, ws, shift, 1) if shift > 0 else None
        )
        if typed_parts is None or (
            pack > 1 and _packed_layout() == "wide"
        ):
            bm = ""
    if bm == "3":
        base, colx = typed_parts
        rowmask = np.asarray(base, np.float32) * np.float32(-1e9)
        bias_arg = bias.astype(jnp.float32)[None] + jnp.asarray(
            rowmask
        )[:, None]  # (nwin_h, heads, N, N)
        bias_spec = wspec(hp // ws, heads, n, n)
        region_arg = jnp.asarray(
            np.asarray(colx, np.float32) * np.float32(-1e9)
        )
        return bias_arg, bias_spec, region_arg, wspec(n, n), "typed", ""
    folded = bool(bm)
    if folded:
        bias_arg = _fold_bias_region(bias, region_full)
        bias_spec = wspec(nw, heads, n, n)
    else:
        bias_arg = bias.astype(jnp.float32)
        bias_spec = wspec(heads, n, n)
    mask_kind = _mask8_enabled() if (region is not None and not folded) else ""
    if mask_kind:
        region_arg = _neq_mask(region_full, mask_kind)
        region_spec = wspec(nw, n, n)
    else:
        region_arg = region_full
        region_spec = wspec(nw, n)
    return bias_arg, bias_spec, region_arg, region_spec, folded, mask_kind


def pallas_window_block_v6(
    x: jax.Array,          # (B, H, W, C) REAL map
    attn_params,           # (ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias)
    tail_params,           # (ln2_s, ln2_b, w1, b1, w2, b2, aw1, ab1, aw2, ab2)
    region: Optional[jax.Array],
    scale: float,
    heads: int,
    ws: int,
    shift: int = 0,
    eps: float = 1e-5,
    adapter_scale: float = 0.5,
    interpret: bool = False,
) -> jax.Array:
    """v6: one kernel per whole Swin block (attention half + tail)."""
    import os

    interpret = interpret or os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1"
    b, h_, w_, c = x.shape
    n = ws * ws
    hp = _round_up(h_, ws)
    wp = _round_up(w_, ws)
    nw = (hp // ws) * (wp // ws)
    region_full = (
        jnp.zeros((nw, n), jnp.int32) if region is None else region
    )
    pack = _v5_pack(heads, c, nw, n) if _packed_enabled() else 1

    ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias = attn_params
    g2, b2, w1, b1, w2, b2f, aw1, ab1, aw2, ab2 = tail_params
    hidden = w1.shape[1]
    ca = aw1.shape[-1]
    cdt = x.dtype
    vec = lambda v: v.reshape(1, -1).astype(cdt)  # noqa: E731

    def wspec(*shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    if aw1.ndim == 3:
        # per-stream stacked adapters (S, C, ca): one kernel over the full
        # dual batch; the BlockSpec index map selects each grid step's
        # stream slice (step i -> stream i // (b // S)), so the two
        # modality streams batch through ONE launch with zero glue.
        s_n = aw1.shape[0]
        assert b % s_n == 0, (b, s_n)
        half = b // s_n

        def aspec(*shape):
            return pl.BlockSpec(
                (1, *shape),
                lambda i, half=half: (i // half,) + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        a_specs = [
            aspec(c, ca), aspec(1, ca), aspec(ca, c), aspec(1, c),
        ]
        a_args = [
            aw1.astype(cdt),
            ab1.reshape(s_n, 1, -1).astype(cdt),
            aw2.astype(cdt),
            ab2.reshape(s_n, 1, -1).astype(cdt),
        ]
    else:
        a_specs = [wspec(c, ca), wspec(1, ca), wspec(ca, c), wspec(1, c)]
        a_args = [aw1.astype(cdt), vec(ab1), aw2.astype(cdt), vec(ab2)]

    (bias_arg, bias_spec, region_arg, region_spec, folded,
     mask_kind) = _wholemap_bias_region(
        bias, region, region_full, hp, wp, ws, shift, heads, n, nw, pack,
        wspec,
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_v6, eps=eps, scale=scale, heads=heads, ws=ws,
            shift=shift, hp=hp, wp=wp, pack=pack,
            adapter_scale=adapter_scale, layout=_packed_layout(),
            folded=folded, mask8=bool(mask_kind),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_, w_, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h_, w_, c), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec(1, c), wspec(1, c),
            wspec(c, 3 * c), wspec(1, 3 * c),
            wspec(c, c), wspec(1, c),
            bias_spec,
            region_spec,
            wspec(1, c), wspec(1, c),
            wspec(c, hidden), wspec(1, hidden),
            wspec(hidden, c), wspec(1, c),
            *a_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, h_, w_, c), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((nw, n, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, vec(ln_s), vec(ln_b),
        wqkv.astype(cdt), vec(bqkv), wproj.astype(cdt), vec(bproj),
        bias_arg, region_arg,
        vec(g2), vec(b2),
        w1.astype(cdt), vec(b1), w2.astype(cdt), vec(b2f),
        *a_args,
    )
    return out


def _block_v6_reference(
    x, attn_params, tail_params, region, scale, heads, ws, shift=0,
    eps=1e-5, adapter_scale=0.5,
):
    """XLA twin of v6: the v5 twin followed by the tail twin."""
    from ir_ads_tpu.ops.pallas_mlp import block_tail_reference

    y = _block_full_reference(
        x, *attn_params, region, scale, heads, ws, shift=shift, eps=eps
    )
    b, h_, w_, c = y.shape
    g2, b2, w1, b1, w2, b2f, aw1, ab1, aw2, ab2 = tail_params
    if aw1.ndim == 3:  # per-stream stacked adapters (dual mode)
        s_n = aw1.shape[0]
        half = b // s_n
        out = jnp.concatenate(
            [
                block_tail_reference(
                    y[i * half : (i + 1) * half].reshape(-1, c),
                    g2, b2, w1, b1, w2, b2f,
                    aw1[i], ab1[i], aw2[i], ab2[i],
                    eps=eps, adapter_scale=adapter_scale,
                )
                for i in range(s_n)
            ],
            axis=0,
        )
    else:
        out = block_tail_reference(
            y.reshape(-1, c), *tail_params, eps=eps,
            adapter_scale=adapter_scale,
        )
    return out.reshape(b, h_, w_, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_window_block_v6(
    x, attn_params, tail_params, region, scale, heads, ws, shift=0,
):
    """v6 Pallas forward + XLA-recompute backward."""
    return pallas_window_block_v6(
        x, attn_params, tail_params, region, scale, heads, ws, shift=shift
    )


def _fused_v6_fwd(x, attn_params, tail_params, region, scale, heads, ws,
                  shift):
    out = pallas_window_block_v6(
        x, attn_params, tail_params, region, scale, heads, ws, shift=shift
    )
    return out, (x, attn_params, tail_params, region)


def _fused_v6_bwd(scale, heads, ws, shift, res, g):
    x, attn_params, tail_params, region = res
    _, vjp = jax.vjp(
        lambda xx, ap, tp: _block_v6_reference(
            xx, ap, tp, region, scale, heads, ws, shift=shift
        ),
        x, attn_params, tail_params,
    )
    dx, dap, dtp = vjp(g)
    dregion = None if region is None else jnp.zeros_like(region)
    return dx, dap, dtp, dregion


fused_window_block_v6.defvjp(_fused_v6_fwd, _fused_v6_bwd)


def _v5_pack(heads: int, c: int, n_windows: int, n: int) -> int:
    """Largest pack factor whose f32 score block stays under ~24 MB."""
    d = c // heads
    p = 128 // max(d, 1) if d and 128 % d == 0 else 1
    while p > 1 and (heads % p or n_windows * p * n * n * 4 > 24 * 1024 * 1024):
        p //= 2
    return max(p, 1)


def pallas_window_block_full(
    x: jax.Array,          # (B, H, W, C) REAL map (no pad, no roll)
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wproj: jax.Array,
    bproj: jax.Array,
    bias: jax.Array,       # (heads, N, N)
    region: Optional[jax.Array],  # (nW, N) int32 or None
    scale: float,
    heads: int,
    ws: int,
    shift: int = 0,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """v5: whole-map fused half-block.  Returns the REAL-map y."""
    import os

    interpret = interpret or os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1"
    b, h_, w_, c = x.shape
    n = ws * ws
    hp = _round_up(h_, ws)
    wp = _round_up(w_, ws)
    nw = (hp // ws) * (wp // ws)
    if region is None:
        region_full = jnp.zeros((nw, n), jnp.int32)
    else:
        region_full = region
    pack = (
        _v5_pack(heads, c, nw, n) if _packed_enabled() else 1
    )

    cdt = x.dtype
    vec = lambda v: v.reshape(1, -1).astype(cdt)  # noqa: E731

    def wspec(*shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    (bias_arg, bias_spec, region_arg, region_spec, folded,
     mask_kind) = _wholemap_bias_region(
        bias, region, region_full, hp, wp, ws, shift, heads, n, nw, pack,
        wspec,
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_v5, eps=eps, scale=scale, heads=heads, ws=ws,
            shift=shift, hp=hp, wp=wp, pack=pack, layout=_packed_layout(),
            folded=folded, mask8=bool(mask_kind),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_, w_, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h_, w_, c), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec(1, c), wspec(1, c),
            wspec(c, 3 * c), wspec(1, 3 * c),
            wspec(c, c), wspec(1, c),
            bias_spec,
            region_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, h_, w_, c), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((nw, n, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, vec(ln_scale), vec(ln_bias),
        wqkv.astype(cdt), vec(bqkv), wproj.astype(cdt), vec(bproj),
        bias_arg, region_arg,
    )
    return out


def _block_full_reference(
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region, scale,
    heads, ws, shift=0, eps=1e-5,
):
    """XLA twin of the v5 kernel (module-path semantics on the real map)."""
    b, h_, w_, c = x.shape
    hp = _round_up(h_, ws)
    wp = _round_up(w_, ws)
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = (
        xn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    ).astype(cdt)
    xn = jnp.pad(xn, ((0, 0), (0, hp - h_), (0, wp - w_), (0, 0)))
    if shift:
        xn = jnp.roll(xn, shift=(-shift, -shift), axis=(1, 2))
    qkv = (
        jnp.dot(xn, wqkv.astype(cdt), preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    ).astype(cdt)
    att = _map_reference(qkv, bias, region, scale, heads, ws)
    if shift:
        att = jnp.roll(att, shift=(shift, shift), axis=(1, 2))
    att = att[:, :h_, :w_]
    out = (
        jnp.dot(att, wproj.astype(cdt), preferred_element_type=jnp.float32)
        + bproj.astype(jnp.float32)
    )
    return (xf + out).astype(cdt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def fused_window_block_full(
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region, scale,
    heads, ws, shift=0,
):
    """v5 Pallas forward + XLA-recompute backward.  x: (B, H, W, C) REAL
    map; pad/roll/crop all happen inside the kernel."""
    return pallas_window_block_full(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region,
        scale, heads, ws, shift=shift,
    )


def _fused_full_fwd(
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region, scale,
    heads, ws, shift,
):
    out = pallas_window_block_full(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region,
        scale, heads, ws, shift=shift,
    )
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region)


def _fused_full_bwd(scale, heads, ws, shift, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region = res
    _, vjp = jax.vjp(
        lambda *a: _block_full_reference(
            *a, region, scale, heads, ws, shift=shift
        ),
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias,
    )
    grads = vjp(g)
    dregion = None if region is None else jnp.zeros_like(region)
    return (*grads, dregion)


fused_window_block_full.defvjp(_fused_full_fwd, _fused_full_bwd)


def _block_reference(
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region, scale,
    heads, ws, h_real=None, w_real=None, shift=0, eps=1e-5,
):
    """XLA twin of the v4 kernel (same rounding points; also the backward)."""
    cdt = x.dtype
    b, hp, wpx, c = x.shape
    h_real = hp if h_real is None else h_real
    w_real = wpx if w_real is None else w_real
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    if h_real != hp or w_real != wpx:
        row = jnp.arange(hp)[:, None]
        col = jnp.arange(wpx)[None, :]
        pad = ((row + shift) % hp >= h_real) | ((col + shift) % wpx >= w_real)
        xn = jnp.where(pad[None, :, :, None], 0.0, xn)
    xn = xn.astype(cdt)
    qkv = (
        jnp.dot(xn, wqkv.astype(cdt), preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    ).astype(cdt)
    att = _map_reference(qkv, bias, region, scale, heads, ws)
    out = (
        jnp.dot(att, wproj.astype(cdt), preferred_element_type=jnp.float32)
        + bproj.astype(jnp.float32)
    )
    return (xf + out).astype(cdt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def fused_window_block(
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region, scale,
    heads, ws, h_real=None, w_real=None, shift=0,
):
    """v4 Pallas forward + XLA-recompute backward.

    x: (B, Hp, Wp, C) rolled/padded map; returns y = x + proj(attn(...)),
    same shape."""
    return pallas_window_block(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region,
        scale, heads, ws, h_real=h_real, w_real=w_real, shift=shift,
    )


def _fused_block_fwd(
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region, scale,
    heads, ws, h_real, w_real, shift,
):
    out = pallas_window_block(
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region,
        scale, heads, ws, h_real=h_real, w_real=w_real, shift=shift,
    )
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region)


def _fused_block_bwd(scale, heads, ws, h_real, w_real, shift, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region = res
    if _attn_bwd_mode() == "pallas":
        grads = _block_bwd_manual(
            res, g, scale, heads, ws, h_real, w_real, shift
        )
    else:
        _, vjp = jax.vjp(
            lambda *a: _block_reference(
                *a, region, scale, heads, ws,
                h_real=h_real, w_real=w_real, shift=shift,
            ),
            x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias,
        )
        grads = vjp(g)
    dregion = None if region is None else jnp.zeros_like(region)
    return (*grads, dregion)


fused_window_block.defvjp(_fused_block_fwd, _fused_block_bwd)


# --------------------------------------------------------------------------
# v7 kernel: banded FULL block for the big-map stages — the v4 attention
# half (one band of window rows per grid step) immediately followed by the
# block tail (LN2 + FFN + adapter + residual) in the same kernel, so the
# attention-half output never round-trips HBM between the two kernels.
# Unlike v6 the map does NOT need to fit VMEM (stage-0 480p scores at
# pack=4 are ~46 MB whole-map — the reason v6 is gated to stages 2-3).
#
# The tail runs in ROLLED/PADDED coordinates: it is strictly per-token, so
# tail(unroll(crop(y))) == unroll(crop(tail(y))) at every real position and
# the padded/rolled positions are discarded by the XLA un-roll + crop that
# follows (same as the v4 caller).  Numerics: the attention-half residual
# is rounded to the map dtype BEFORE the tail (y2 below), making v7
# bitwise the fused_window_block -> fused_block_tail composition it
# replaces.
# --------------------------------------------------------------------------


def _attn_kernel_v7(
    x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
    region_ref, g2_ref, b2_ref, w1_ref, b1_ref, w2_ref, b2f_ref,
    aw1_ref, ab1_ref, aw2_ref, ab2_ref, o_ref, outw_ref, *,
    eps, scale, heads, ws, nwin_w, hp, h_real, w_real, shift, packed,
    adapter_scale, layout="tall",
):
    """Grid: (B, n_bands).  x/o: (1, rows*ws, Wp, C) band of the
    rolled/padded map; outw: (G, N, C) scratch.  Attention half identical
    to _attn_kernel_v4 (plain region path), then the v6-style chunked tail
    on the band rows."""
    x = x_ref[0]  # (rh, wp, C)
    rh, wpx, c = x.shape
    rows = rh // ws
    n = ws * ws
    cdt = wqkv_ref.dtype

    xf = x.reshape(rh * wpx, c).astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    if h_real != hp or w_real != wpx:
        j = pl.program_id(1)
        f = jax.lax.broadcasted_iota(jnp.int32, (rh * wpx, 1), 0)
        row = j * rh + f // wpx
        col = f % wpx
        pad = jnp.logical_or(
            (row + shift) % hp >= h_real, (col + shift) % wpx >= w_real
        )
        xn = jnp.where(pad, 0.0, xn)
    xn = xn.astype(cdt)

    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(cdt)
    qkvw = (
        qkv.reshape(rows, ws, nwin_w, ws, 3 * c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * nwin_w, n, 3 * c)
    )
    region = region_ref[0]
    neq = region[:, :, None] != region[:, None, :]  # (G, N, N)
    _heads_attention(
        qkvw, bias_ref[...], neq, outw_ref,
        scale=scale, heads=heads, cdt=cdt, packed=packed, layout=layout,
    )
    att = (
        outw_ref[...]
        .reshape(rows, nwin_w, ws, ws, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rh * wpx, c)
    )
    out = jax.lax.dot_general(
        att, wp_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[...].astype(jnp.float32)
    # round the attention-half residual like the v4 kernel output so the
    # tail sees EXACTLY what the two-kernel composition saw
    y2 = (xf + out).astype(o_ref.dtype)

    hw = rh * wpx
    chunk = 2048 if hw > 2048 else hw
    aw1 = aw1_ref[...] if aw1_ref.ndim == 2 else aw1_ref[0]
    ab1 = ab1_ref[...] if ab1_ref.ndim == 2 else ab1_ref[0]
    aw2 = aw2_ref[...] if aw2_ref.ndim == 2 else aw2_ref[0]
    ab2 = ab2_ref[...] if ab2_ref.ndim == 2 else ab2_ref[0]
    outs = []
    for r0 in range(0, hw, chunk):
        r1 = min(r0 + chunk, hw)
        yb = y2[r0:r1]
        ybf = yb.astype(jnp.float32)
        mu2 = jnp.mean(ybf, axis=1, keepdims=True)
        yc = ybf - mu2
        var2 = jnp.mean(yc * yc, axis=1, keepdims=True)
        yn = yc * jax.lax.rsqrt(var2 + eps)
        yn = (
            yn * g2_ref[...].astype(jnp.float32)
            + b2_ref[...].astype(jnp.float32)
        ).astype(cdt)
        hdn = jax.lax.dot_general(
            yn, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...].astype(jnp.float32)
        hdn = jax.nn.gelu(hdn, approximate=True).astype(cdt)
        ffn = jax.lax.dot_general(
            hdn, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2f_ref[...].astype(jnp.float32)
        a = jax.lax.dot_general(
            yb, aw1,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ab1.astype(jnp.float32)
        a = jnp.maximum(a, 0.0).astype(cdt)
        a = jax.lax.dot_general(
            a, aw2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ab2.astype(jnp.float32)
        outs.append((ybf + ffn + adapter_scale * a).astype(o_ref.dtype))
    o_ref[0] = (
        outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    ).reshape(rh, wpx, c)


def pallas_window_block_v7(
    x: jax.Array,          # (B, Hp, Wp, C) rolled/padded map
    attn_params,           # (ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias)
    tail_params,           # (ln2_s, ln2_b, w1, b1, w2, b2, aw1, ab1, aw2, ab2)
    region: Optional[jax.Array],
    scale: float,
    heads: int,
    ws: int,
    h_real: Optional[int] = None,
    w_real: Optional[int] = None,
    shift: int = 0,
    eps: float = 1e-5,
    adapter_scale: float = 0.5,
    rows_per_step: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """v7: banded v4 attention half + the block tail in one kernel."""
    import os

    interpret = interpret or os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1"
    b, hp, wpx, c = x.shape
    h_real = hp if h_real is None else h_real
    w_real = wpx if w_real is None else w_real
    n = ws * ws
    nwin_h, nwin_w = hp // ws, wpx // ws
    if rows_per_step is None:
        want = int(os.environ.get("IR_ADS_SWIN_V4_ROWS", "2"))
        rows_per_step = max(
            cd for cd in range(1, nwin_h + 1)
            if nwin_h % cd == 0 and cd <= want
        )
    g = rows_per_step * nwin_w
    region_full = (
        jnp.zeros((nwin_h * nwin_w, n), jnp.int32) if region is None
        else region
    )
    n_bands = nwin_h // rows_per_step
    region_banded = region_full.reshape(n_bands, g, n)

    ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias = attn_params
    g2, b2, w1, b1, w2, b2f, aw1, ab1, aw2, ab2 = tail_params
    hidden = w1.shape[1]
    ca = aw1.shape[-1]
    cdt = x.dtype
    vec = lambda v: v.reshape(1, -1).astype(cdt)  # noqa: E731

    def wspec(*shape):
        return pl.BlockSpec(
            shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    if aw1.ndim == 3:
        # per-stream stacked adapters: grid step i -> stream i // (b // S)
        s_n = aw1.shape[0]
        assert b % s_n == 0, (b, s_n)
        half = b // s_n

        def aspec(*shape):
            return pl.BlockSpec(
                (1, *shape),
                lambda i, j, half=half: (i // half,) + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        a_specs = [aspec(c, ca), aspec(1, ca), aspec(ca, c), aspec(1, c)]
        a_args = [
            aw1.astype(cdt),
            ab1.reshape(s_n, 1, -1).astype(cdt),
            aw2.astype(cdt),
            ab2.reshape(s_n, 1, -1).astype(cdt),
        ]
    else:
        a_specs = [wspec(c, ca), wspec(1, ca), wspec(ca, c), wspec(1, c)]
        a_args = [aw1.astype(cdt), vec(ab1), aw2.astype(cdt), vec(ab2)]

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_v7, eps=eps, scale=scale, heads=heads, ws=ws,
            nwin_w=nwin_w, hp=hp, h_real=h_real, w_real=w_real, shift=shift,
            packed=_packed_enabled(), layout=_packed_layout(),
            adapter_scale=adapter_scale,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wpx, c), x.dtype),
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec(
                (1, rows_per_step * ws, wpx, c),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec(1, c), wspec(1, c),
            wspec(c, 3 * c), wspec(1, 3 * c),
            wspec(c, c), wspec(1, c),
            wspec(heads, n, n),
            pl.BlockSpec(
                (1, g, n), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
            ),
            wspec(1, c), wspec(1, c),
            wspec(c, hidden), wspec(1, hidden),
            wspec(hidden, c), wspec(1, c),
            *a_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_step * ws, wpx, c),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((g, n, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, vec(ln_s), vec(ln_b),
        wqkv.astype(cdt), vec(bqkv), wproj.astype(cdt), vec(bproj),
        bias.astype(jnp.float32), region_banded,
        vec(g2), vec(b2),
        w1.astype(cdt), vec(b1), w2.astype(cdt), vec(b2f),
        *a_args,
    )
    return out


def _block_v7_reference(
    x, attn_params, tail_params, region, scale, heads, ws, h_real, w_real,
    shift=0, eps=1e-5, adapter_scale=0.5,
):
    """XLA twin of v7: the v4 twin followed by the tail twin, both on the
    rolled/padded map (tail in rolled coordinates, like the kernel)."""
    from ir_ads_tpu.ops.pallas_mlp import block_tail_reference

    y = _block_reference(
        x, *attn_params, region, scale, heads, ws,
        h_real=h_real, w_real=w_real, shift=shift, eps=eps,
    )
    b, hp, wpx, c = y.shape
    g2, b2, w1, b1, w2, b2f, aw1, ab1, aw2, ab2 = tail_params
    if aw1.ndim == 3:
        s_n = aw1.shape[0]
        half = b // s_n
        out = jnp.concatenate(
            [
                block_tail_reference(
                    y[i * half : (i + 1) * half].reshape(-1, c),
                    g2, b2, w1, b1, w2, b2f,
                    aw1[i], ab1[i], aw2[i], ab2[i],
                    eps=eps, adapter_scale=adapter_scale,
                )
                for i in range(s_n)
            ],
            axis=0,
        )
    else:
        out = block_tail_reference(
            y.reshape(-1, c), *tail_params, eps=eps,
            adapter_scale=adapter_scale,
        )
    return out.reshape(b, hp, wpx, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_window_block_v7(
    x, attn_params, tail_params, region, scale, heads, ws, h_real, w_real,
    shift=0,
):
    """v7 Pallas forward + XLA-recompute backward."""
    return pallas_window_block_v7(
        x, attn_params, tail_params, region, scale, heads, ws,
        h_real=h_real, w_real=w_real, shift=shift,
    )


def _fused_v7_fwd(x, attn_params, tail_params, region, scale, heads, ws,
                  h_real, w_real, shift):
    out = pallas_window_block_v7(
        x, attn_params, tail_params, region, scale, heads, ws,
        h_real=h_real, w_real=w_real, shift=shift,
    )
    return out, (x, attn_params, tail_params, region)


def _fused_v7_bwd(scale, heads, ws, h_real, w_real, shift, res, g):
    x, attn_params, tail_params, region = res
    _, vjp = jax.vjp(
        lambda xx, ap, tp: _block_v7_reference(
            xx, ap, tp, region, scale, heads, ws, h_real, w_real,
            shift=shift,
        ),
        x, attn_params, tail_params,
    )
    dx, dap, dtp = vjp(g)
    dregion = None if region is None else jnp.zeros_like(region)
    return dx, dap, dtp, dregion


fused_window_block_v7.defvjp(_fused_v7_fwd, _fused_v7_bwd)


# --------------------------------------------------------------------------
# round-5: Pallas attention BACKWARD kernel (VERDICT r5 item 4)
#
# Every fused-forward custom_vjp above re-derives its grads by jax.vjp of
# the XLA reference twin, which materializes the (B*nW, heads, N, N) score
# and softmax tensors in f32 HBM twice (forward-in-vjp + backward).  The
# round-5 train-step profile (dev/logs/r5b.log) charged 90.6 ms of the
# 275 ms bs4 480x640 profile-step to the stage-2 backward scans alone —
# almost all of it those materializations plus the VPU softmax passes over
# them.  This kernel recomputes the scores in VMEM (flash-attention style,
# exact — windows are small enough that no online softmax is needed) and
# emits, in one HBM pass over the windowed qkv:
#   dqkv   (B*nW, N, 3C)  grads of the packed qkv projection output
#   ow     (B*nW, N, C)   the (re)computed attention output — the out-proj
#                         weight grad needs it, and it falls out of the PV
#                         recompute for one extra MXU dot
#   dbias  (heads, N, N)  f32 grad of the dense rel-pos bias, accumulated
#                         across all grid steps (revisited output block)
# The LN / qkv-projection / out-projection glue grads are plain MXU
# matmuls with no N x N tensors, left to XLA in the manual bwd wrappers
# below.  Math: d(softmax) vjp — dS = P * (dP - rowsum(dP * P)); the
# MXU dots use the same tall head-packing as the forward (_heads_attention
# docstring): p = 128/d heads per contraction via block-diagonal row
# packing, so every dot contracts full 128 K lanes.
# Reference semantics: semseg swin.py:81-125 (WindowMSA), differentiated.
# --------------------------------------------------------------------------


def _attn_bwd_kernel(
    qkv_ref, do_ref, bias_ref, region_ref, dqkv_ref, *rest,
    scale, heads, want_ow=True, want_dbias=True,
):
    """One chunk of G windows: recompute softmax in VMEM, emit grads.

    qkv: (G, N, 3C) cdt; do: (G, N, C) cdt — the attention-output
    cotangent, already window-partitioned; bias: (heads, N, N) f32;
    region: (G, N) int32 (constant rows => no mask).  Outputs: dqkv
    (G, N, 3C) cdt, then (when requested) ow (G, N, C) cdt and dbias
    (heads, N, N) f32 accumulated across grid steps (same block every
    step).  want_ow/want_dbias=False skip those outputs AND their
    compute — the adapter-only freeze recipe (reference optimizers.py:
    7-31, the shipped configs) discards every attention-parameter grad
    via optax.masked, so the out-proj-weight and bias grads are never
    consumed (IR_ADS_ATTN_BWD_TRAINABLES=adapter)."""
    rest = list(rest)
    ow_ref = rest.pop(0) if want_ow else None
    dbias_ref = rest.pop(0) if want_dbias else None
    qkv = qkv_ref[...]
    do = do_ref[...]
    g_, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    cdt = qkv.dtype

    region = region_ref[...]
    neq = region[:, :, None] != region[:, None, :]  # (G, N, N)
    maskf = jnp.where(neq, -1e9, 0.0).astype(jnp.float32)

    p = 128 // max(d, 1) if d and 128 % d == 0 else 1
    while p > 1 and heads % p:
        p //= 2

    if want_dbias:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

    if p > 1:
        pd = p * d
        pn = p * n
        row_head = jax.lax.broadcasted_iota(jnp.int32, (pn, pd), 0) // n
        col_head = jax.lax.broadcasted_iota(jnp.int32, (pn, pd), 1) // d
        sel_f = (row_head == col_head).astype(cdt)  # (pN, pd) block-diag
        sel3 = (
            jax.lax.broadcasted_iota(jnp.int32, (p, 1, pd), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (p, 1, pd), 2) // d
        ).astype(jnp.float32)  # (p, 1, pd) diagonal-block extractor
        mask_t = jnp.concatenate([maskf] * p, axis=1)  # (G, pN, N)
        batch = (((0,), (0,)),)

        for h0 in range(0, heads, p):
            lo = h0 * d
            qg = qkv[:, :, lo : lo + pd]
            kg = qkv[:, :, c + lo : c + lo + pd]
            vg = qkv[:, :, 2 * c + lo : 2 * c + lo + pd]
            dog = do[:, :, lo : lo + pd]
            # block-diagonal row packing (exact zeros off-block)
            q_bd = jnp.concatenate([qg] * p, axis=1) * sel_f[None]
            do_bd = jnp.concatenate([dog] * p, axis=1) * sel_f[None]
            # scores + softmax recompute, f32 in VMEM
            s = jax.lax.dot_general(
                q_bd, kg, (((2,), (2,)), *batch),
                preferred_element_type=jnp.float32,
            ) * scale  # (G, pN, N)
            bias_grp = bias_ref[h0 : h0 + p].reshape(pn, n)
            s = s + bias_grp[None] + mask_t
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            pr = e / jnp.sum(e, axis=-1, keepdims=True)  # (G, pN, N) f32
            pc = pr.astype(cdt)
            if want_ow:
                # forward output (for the out-proj weight grad outside)
                o_full = jax.lax.dot_general(
                    pc, vg, (((2,), (1,)), *batch),
                    preferred_element_type=jnp.float32,
                )  # (G, pN, pd)
                o_sel = jnp.sum(
                    o_full.reshape(g_, p, n, pd) * sel3[None], axis=1
                )  # (G, N, pd)
                ow_ref[:, :, lo : lo + pd] = o_sel.astype(cdt)
            # softmax vjp
            dp = jax.lax.dot_general(
                do_bd, vg, (((2,), (2,)), *batch),
                preferred_element_type=jnp.float32,
            )  # (G, pN, N)
            dv = jax.lax.dot_general(
                pc, do_bd, (((1,), (1,)), *batch),
                preferred_element_type=jnp.float32,
            )  # (G, N, pd) — column slice h = P_h^T dO_h
            ds = pr * (dp - jnp.sum(dp * pr, axis=-1, keepdims=True))
            if want_dbias:
                # bias grad: sum over windows; (G, pN, N) -> (p, N, N)
                db = jnp.sum(ds.reshape(g_, p, n, n), axis=0)
                dbias_ref[h0 : h0 + p] = dbias_ref[h0 : h0 + p] + db
            ds_c = (ds * scale).astype(cdt)
            dq_full = jax.lax.dot_general(
                ds_c, kg, (((2,), (1,)), *batch),
                preferred_element_type=jnp.float32,
            )  # (G, pN, pd)
            dq = jnp.sum(
                dq_full.reshape(g_, p, n, pd) * sel3[None], axis=1
            )
            dk = jax.lax.dot_general(
                ds_c, q_bd, (((1,), (1,)), *batch),
                preferred_element_type=jnp.float32,
            )  # (G, N, pd) — column slice h = dS_h^T Q_h
            dqkv_ref[:, :, lo : lo + pd] = dq.astype(cdt)
            dqkv_ref[:, :, c + lo : c + lo + pd] = dk.astype(cdt)
            dqkv_ref[:, :, 2 * c + lo : 2 * c + lo + pd] = dv.astype(cdt)
    else:
        batch = (((0,), (0,)),)
        for h in range(heads):
            lo = h * d
            qg = qkv[:, :, lo : lo + d]
            kg = qkv[:, :, c + lo : c + lo + d]
            vg = qkv[:, :, 2 * c + lo : 2 * c + lo + d]
            dog = do[:, :, lo : lo + d]
            s = jax.lax.dot_general(
                qg, kg, (((2,), (2,)), *batch),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_ref[h][None] + maskf
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            pr = e / jnp.sum(e, axis=-1, keepdims=True)
            pc = pr.astype(cdt)
            if want_ow:
                ow_ref[:, :, lo : lo + d] = jax.lax.dot_general(
                    pc, vg, (((2,), (1,)), *batch),
                    preferred_element_type=jnp.float32,
                ).astype(cdt)
            dp = jax.lax.dot_general(
                dog, vg, (((2,), (2,)), *batch),
                preferred_element_type=jnp.float32,
            )
            dv = jax.lax.dot_general(
                pc, dog, (((1,), (1,)), *batch),
                preferred_element_type=jnp.float32,
            )
            ds = pr * (dp - jnp.sum(dp * pr, axis=-1, keepdims=True))
            if want_dbias:
                dbias_ref[h] = dbias_ref[h] + jnp.sum(ds, axis=0)
            ds_c = (ds * scale).astype(cdt)
            dqkv_ref[:, :, lo : lo + d] = jax.lax.dot_general(
                ds_c, kg, (((2,), (1,)), *batch),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
            dqkv_ref[:, :, c + lo : c + lo + d] = jax.lax.dot_general(
                ds_c, qg, (((1,), (1,)), *batch),
                preferred_element_type=jnp.float32,
            ).astype(cdt)
            dqkv_ref[:, :, 2 * c + lo : 2 * c + lo + d] = dv.astype(cdt)


def pallas_window_attention_bwd(
    qkvw: jax.Array,          # (B*nW, N, 3C) windowed qkv (recomputed)
    dow: jax.Array,           # (B*nW, N, C) attention-output cotangent
    bias: jax.Array,          # (heads, N, N)
    region: Optional[jax.Array],  # (nW, N) int32 or None
    scale: float,
    heads: int,
    window_chunk: Optional[int] = None,
    interpret: bool = False,
    want_ow: bool = True,
    want_dbias: bool = True,
):
    """Returns (dqkv (B*nW,N,3C), ow (B*nW,N,C) | None, dbias
    (heads,N,N) f32 | None).  want_ow/want_dbias=False skip the output
    AND its in-kernel compute (adapter-only freeze fast path)."""
    import os

    interpret = interpret or os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1"
    bn, n, c3 = qkvw.shape
    c = c3 // 3
    if window_chunk:
        g = window_chunk
    elif c <= 128:
        g = 32
    elif c <= 256:
        g = 16
    else:
        g = 8
    g = min(g, _round_up(bn, 8))
    bn_pad = _round_up(bn, g)
    qkv_p = jnp.pad(qkvw, ((0, bn_pad - bn), (0, 0), (0, 0)))
    do_p = jnp.pad(dow, ((0, bn_pad - bn), (0, 0), (0, 0)))
    if region is None:
        region_full = jnp.zeros((bn_pad, n), jnp.int32)
    else:
        nw = region.shape[0]
        region_full = jnp.tile(region, (bn // nw, 1))
        region_full = jnp.pad(
            region_full, ((0, bn_pad - bn), (0, 0)), constant_values=-1
        )
    out_shape = [jax.ShapeDtypeStruct((bn_pad, n, c3), qkvw.dtype)]
    out_specs = [
        pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if want_ow:
        out_shape.append(jax.ShapeDtypeStruct((bn_pad, n, c), qkvw.dtype))
        out_specs.append(
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    if want_dbias:
        out_shape.append(
            jax.ShapeDtypeStruct((heads, n, n), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    outs = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, scale=scale, heads=heads,
            want_ow=want_ow, want_dbias=want_dbias,
        ),
        out_shape=out_shape,
        grid=(bn_pad // g,),
        in_specs=[
            pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qkv_p, do_p, bias.astype(jnp.float32), region_full)
    outs = list(outs)
    dqkv = outs.pop(0)[:bn]
    ow = outs.pop(0)[:bn] if want_ow else None
    dbias = outs.pop(0) if want_dbias else None
    return dqkv, ow, dbias


def _attn_bwd_mode() -> str:
    import os

    mode = os.environ.get("IR_ADS_ATTN_BWD", "auto")
    if mode in ("xla", "pallas"):
        return mode
    if os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1":
        return "pallas"
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _attn_bwd_trainables() -> str:
    """'all' (default) or 'adapter': under the reference's adapter-only
    freeze (TRAIN_TYPE: Adapter, optimizers.py:7-31 — every shipped
    config) the attention parameters (LN1/qkv/proj/rel-pos table) receive
    no update: optax.masked discards their grads.  'adapter' skips
    computing them (zero cotangents) — the bwd kernel drops the dbias
    accumulation and the ow recompute + out-proj weight-grad dot.  Set
    automatically by train_mm when TRAIN_TYPE=Adapter; WRONG for
    full-model fine-tuning, hence opt-in."""
    import os

    return os.environ.get("IR_ADS_ATTN_BWD_TRAINABLES", "all")


def _block_bwd_manual(res, g, scale, heads, ws, h_real, w_real, shift,
                      eps=1e-5):
    """Hand-written vjp of _block_reference using the Pallas bwd kernel.

    All recomputes here are MXU matmuls / VPU LN passes on (tokens, C)
    tensors — the only N x N work happens inside _attn_bwd_kernel's VMEM.
    Mirrors _block_reference's composition exactly (LN1 -> pad-zero ->
    qkv -> windowed attention -> out proj -> residual); grads agree with
    jax.vjp of the reference to compute-dtype tolerance
    (tests/test_pallas_swin_bwd.py)."""
    from ir_ads_tpu.ops.window_attention import (
        window_partition,
        window_reverse,
    )

    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, region = res
    cdt = x.dtype
    b, hp, wpx, c = x.shape
    h_real = hp if h_real is None else h_real
    w_real = wpx if w_real is None else w_real
    n = ws * ws

    # ---- recompute LN1 / pad mask / qkv (no N x N tensors) ----
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    xn = xhat * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    padm = None
    if h_real != hp or w_real != wpx:
        row = jnp.arange(hp)[:, None]
        col = jnp.arange(wpx)[None, :]
        padm = (
            ((row + shift) % hp >= h_real) | ((col + shift) % wpx >= w_real)
        )[None, :, :, None]
        xn = jnp.where(padm, 0.0, xn)
    xn = xn.astype(cdt)
    qkv = (
        jnp.dot(xn, wqkv.astype(cdt), preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    ).astype(cdt)
    qkvw = window_partition(qkv, ws)  # (B*nW, N, 3C)

    frozen = _attn_bwd_trainables() == "adapter"

    # ---- out-projection + residual grads ----
    gf = g.astype(jnp.float32)
    gc = g.astype(cdt)
    datt = jax.lax.dot_general(
        gc, wproj.astype(cdt), (((3,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)  # (B, Hp, Wp, C) = g @ Wp^T
    dow = window_partition(datt, ws)

    # ---- attention backward (Pallas kernel) ----
    dqkvw, oww, dbias = pallas_window_attention_bwd(
        qkvw, dow, bias, region, scale, heads,
        want_ow=not frozen, want_dbias=not frozen,
    )
    if frozen:
        dwproj = jnp.zeros_like(wproj)
        dbproj = jnp.zeros_like(bproj)
        dwqkv = jnp.zeros_like(wqkv)
        dbqkv = jnp.zeros_like(bqkv)
        dbias = jnp.zeros_like(bias)
        dln_scale = jnp.zeros_like(ln_scale)
        dln_bias = jnp.zeros_like(ln_bias)
    else:
        dbproj = jnp.sum(gf, axis=(0, 1, 2)).astype(bproj.dtype)
        att = window_reverse(oww, ws, hp, wpx)  # (B, Hp, Wp, C)
        dwproj = jax.lax.dot_general(
            att, gc, (((0, 1, 2), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(wproj.dtype)
        dbias = dbias.astype(bias.dtype)

    # ---- qkv-projection grads ----
    dqkv_map = window_reverse(dqkvw, ws, hp, wpx)  # (B, Hp, Wp, 3C)
    if not frozen:
        dbqkv = jnp.sum(
            dqkv_map.astype(jnp.float32), axis=(0, 1, 2)
        ).astype(bqkv.dtype)
        dwqkv = jax.lax.dot_general(
            xn, dqkv_map, (((0, 1, 2), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(wqkv.dtype)
    dxn = jax.lax.dot_general(
        dqkv_map, wqkv.astype(cdt), (((3,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, Hp, Wp, C) f32
    if padm is not None:
        dxn = jnp.where(padm, 0.0, dxn)

    # ---- LN1 backward ----
    if not frozen:
        dln_scale = jnp.sum(
            dxn * xhat, axis=(0, 1, 2)
        ).astype(ln_scale.dtype)
        dln_bias = jnp.sum(dxn, axis=(0, 1, 2)).astype(ln_bias.dtype)
    dxh = dxn * ln_scale.astype(jnp.float32)
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx_ln = inv * (dxh - m1 - xhat * m2)
    dx = (gf + dx_ln).astype(cdt)

    del n
    return dx, dln_scale, dln_bias, dwqkv, dbqkv, dwproj, dbproj, dbias
