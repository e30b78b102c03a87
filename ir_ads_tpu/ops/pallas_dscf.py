"""Fused DSCF (DAttentionMM) attention kernel.

Every pixel attends over M (=2*n_sample) deformable keys with a
continuous-rpe bias (reference DAttentionMM, semseg/models/backbones/
swin.py:938-1006).  The XLA formulation materializes the (HW, M) score
tensor plus the same-shaped bias in HBM (~0.7-1.5 GB of traffic per level at
480p batch 8); this kernel tiles the queries, reads the precomputed bias
exactly once, and keeps scores in VMEM — softmax in f32, matmuls with f32
accumulation, identical contraction semantics to the XLA twin below.

Layout contract (group-major, matching the module's channel grouping):
  q:    (BG, HW, GC)        — BG = batch * n_groups, GC = hg * hc channels
  k, v: (BG, Mp, GC)        — Mp = M padded to a lane multiple (128)
  bias: (BG, HW, hg * Mp)   — per-head bias blocks along lanes, padded key
                              columns filled with -1e9 so softmax drops them
Head e of a group lives in channels [e*hc, (e+1)*hc) and bias lanes
[e*Mp, (e+1)*Mp) — both slices are produced reshape-only (no transposes)
by the caller.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9



def _env_interpret() -> bool:
    import os

    return os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1"

def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _dscf_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, hg):
    q = q_ref[0]  # (QT, GC)
    k = k_ref[0]  # (Mp, GC)
    v = v_ref[0]
    bias = bias_ref[0]  # (QT, hg*Mp)
    mp = k.shape[0]
    hc = q.shape[-1] // hg
    for e in range(hg):
        qe = q[:, e * hc : (e + 1) * hc]
        ke = k[:, e * hc : (e + 1) * hc]
        ve = v[:, e * hc : (e + 1) * hc]
        s = jax.lax.dot_general(
            (qe * scale).astype(qe.dtype),
            ke,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (QT, Mp) f32, VMEM-only
        s = s + bias[:, e * mp : (e + 1) * mp].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        o_ref[0, :, e * hc : (e + 1) * hc] = jax.lax.dot_general(
            p.astype(ve.dtype),
            ve,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def dscf_reference(q, k, v, bias, scale, hg):
    """XLA twin of the kernel (same packed layout; also its backward)."""
    bg, hw, gc = q.shape
    mp = k.shape[1]
    hc = gc // hg

    def heads(t, n):  # (BG, N, GC) -> (BG, hg, N, hc)
        return t.reshape(bg, n, hg, hc).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q, hw), heads(k, mp), heads(v, mp)
    bh = bias.reshape(bg, hw, hg, mp).transpose(0, 2, 1, 3)
    s = (
        jnp.einsum(
            "behd,bemd->behm", qh * scale, kh, preferred_element_type=jnp.float32
        )
        + bh
    )
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "behm,bemd->behd",
        p.astype(vh.dtype),
        vh,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(bg, hw, gc)


def pallas_dscf_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    scale: float,
    hg: int,
    query_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    bg, hw, gc = q.shape
    mp = k.shape[1]
    qt = min(query_tile, _round_up(hw, 8))
    hw_pad = _round_up(hw, qt)
    if hw_pad != hw:
        q = jnp.pad(q, ((0, 0), (0, hw_pad - hw), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, hw_pad - hw), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_dscf_kernel, scale=scale, hg=hg),
        out_shape=jax.ShapeDtypeStruct((bg, hw_pad, gc), q.dtype),
        grid=(bg, hw_pad // qt),
        in_specs=[
            pl.BlockSpec((1, qt, gc), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, hg * mp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qt, gc), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret or _env_interpret(),
    )(q, k, v, bias)
    return out[:, :hw]


def _dscf_rows_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, hg, tile_r, w, m
):
    """Row-tiled kernel consuming the rpe builder's natural layout.

    Grid: (BG, h // tile_r).  Blocks:
      q_ref:    (1, tile_r*w, GC)
      k_ref:    (1, Mp, GC)        — Mp = M rounded up to 8, zero-padded
      v_ref:    (1, Mp, GC)
      bias_ref: (1, hg, tile_r, M, w)  from bias (BG, hg, h, M, w)
      o_ref:    (1, tile_r*w, GC)

    Scores are computed TRANSPOSED (sT = K·Qᵀ, key-major) so the bias plane
    bias[e, rr] (M, w) adds with no transpose at all; softmax reduces over
    the sublane (key) axis.  Everything except q/k/v/bias loads and the
    output store stays in VMEM.
    """
    k = k_ref[0]  # (Mp, GC)
    v = v_ref[0]
    mp = k.shape[0]
    gc = k.shape[-1]
    hc = gc // hg
    for e in range(hg):
        ke = k[:, e * hc : (e + 1) * hc]
        ve = v[:, e * hc : (e + 1) * hc]
        for rr in range(tile_r):
            qe = q_ref[0, rr * w : (rr + 1) * w, e * hc : (e + 1) * hc]
            sT = jax.lax.dot_general(
                ke,
                (qe * scale).astype(qe.dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Mp, w) f32, key-major
            s = sT[:m] + bias_ref[0, e, rr].astype(jnp.float32)  # (M, w)
            if mp != m:
                s = jnp.concatenate(
                    [s, jnp.full((mp - m, w), NEG_INF, jnp.float32)], axis=0
                )
            mx = jnp.max(s, axis=0, keepdims=True)
            ex = jnp.exp(s - mx)
            den = jnp.sum(ex, axis=0, keepdims=True)  # (1, w)
            o = jax.lax.dot_general(
                ex.astype(ve.dtype),
                ve,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (w, hc)
            o = o / den.reshape(w, 1)
            o_ref[0, rr * w : (rr + 1) * w, e * hc : (e + 1) * hc] = o.astype(
                o_ref.dtype
            )


def _dscf_rows_kernel_packed(
    q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, hg, tile_r, w, m
):
    """Packed-slot variant of the rows kernel.

    Every DSCF head has hc = dim/heads = 8 channels at EVERY level (the
    hidden dim and head count double together), so the per-(head, row)
    dots of ``_dscf_rows_kernel`` contract K=8 — 1/16 of the MXU's K lanes
    — and each grid step issues 2*hg*tile_r tiny dots (measured ~8.9 ms
    in-context vs a ~1.5 ms bound).  Same trick as
    ops/pallas_swin._heads_attention, generalized across (row, head)
    slots: pack p = pr*hg slots per dot with a block-diagonal Q

        sT_tall (Mp, p*w) = K_cat (Mp, p*hc) @ Q_bd (p*w, p*hc)^T

    where K_cat = tile(k, (1, pr)) lays slot j's key channels at lane
    block j (slot order row-major/head-minor) and Q_bd zeroes everything
    outside slot j's channel slice — the zero lanes contribute exact 0.0
    to the f32 accumulator, so scores are bitwise the per-slot dots.  The
    PV dot computes all slots at once the same way; diagonal (slot, slot)
    blocks are extracted with a constant mask + sum over slots, which for
    row-major slot order lands each row's hg head outputs contiguously —
    a clean (w, gc) store per row.  Softmax normalization is applied to
    the probabilities BEFORE the PV dot (one broadcast multiply) and the
    normalized probabilities are then rounded to the compute dtype for
    the dot — at bf16 that rounding gives ~1% relative error vs the
    unpacked kernel's post-division of an f32 accumulator (at f32 the
    paths agree to an ulp).
    """
    k = k_ref[0]  # (Mp, GC)
    v = v_ref[0]
    mp = k.shape[0]
    gc = k.shape[-1]
    hc = gc // hg
    cdt = k.dtype
    # row-group size: keep p*hc around the MXU K width and the f32 score
    # matrix (Mp, p*w) bounded
    pr = max(1, min(tile_r, 128 // gc if gc <= 128 else 1))
    for r0 in range(0, tile_r, pr):
        prg = min(pr, tile_r - r0)
        p = prg * hg
        kc = jnp.tile(k, (1, prg))  # (Mp, p*hc)
        vc = jnp.tile(v, (1, prg))
        pieces = []
        bias_cols = []
        for j in range(p):
            rr, e = r0 + j // hg, j % hg
            qe = q_ref[0, rr * w : (rr + 1) * w, e * hc : (e + 1) * hc]
            qs = (qe * scale).astype(qe.dtype)  # same rounding as unpacked
            zl = jnp.zeros((w, j * hc), cdt)
            zr = jnp.zeros((w, (p - 1 - j) * hc), cdt)
            pieces.append(
                qs if p == 1 else jnp.concatenate(
                    [a for a in (zl, qs, zr) if a.shape[1]], axis=1
                )
            )
            bias_cols.append(bias_ref[0, e, rr].astype(jnp.float32))
        q_bd = pieces[0] if p == 1 else jnp.concatenate(pieces, axis=0)
        bias_tall = (
            bias_cols[0] if p == 1 else jnp.concatenate(bias_cols, axis=1)
        )  # (M, p*w)
        sT = jax.lax.dot_general(
            kc, q_bd,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Mp, p*w) f32
        s = sT[:m] + bias_tall
        if mp != m:
            s = jnp.concatenate(
                [s, jnp.full((mp - m, p * w), NEG_INF, jnp.float32)], axis=0
            )
        mx = jnp.max(s, axis=0, keepdims=True)
        ex = jnp.exp(s - mx)
        den = jnp.sum(ex, axis=0, keepdims=True)  # (1, p*w)
        exn = (ex / den).astype(cdt)
        o_full = jax.lax.dot_general(
            exn, vc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (p*w, p*hc) f32
        if p == 1:
            red = o_full
        else:
            osel = (
                jax.lax.broadcasted_iota(jnp.int32, (p, 1, p * hc), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (p, 1, p * hc), 2)
                // hc
            ).astype(jnp.float32)
            red = jnp.sum(o_full.reshape(p, w, p * hc) * osel, axis=0)
        # (w, p*hc): row rr's hg head outputs sit at lanes
        # [(rr-r0)*gc : (rr-r0+1)*gc] (row-major/head-minor slot order)
        for rr in range(r0, r0 + prg):
            o_ref[0, rr * w : (rr + 1) * w, :] = red[
                :, (rr - r0) * gc : (rr - r0 + 1) * gc
            ].astype(o_ref.dtype)


def _packed_rows_enabled() -> bool:
    """Global IR_ADS_DSCF_PACKED default for callers without a level.

    The env var also accepts a per-level comma list ("1,1,1,0" — see
    DAttentionMM, which resolves its own level before calling).  A caller
    that reaches THIS fallback doesn't know its level, so a comma list must
    resolve to the safe default (unpacked): treating "1,1,1,0" as truthy
    here would enable packing for the level-3 shape that crashes Mosaic.
    """
    import os

    val = os.environ.get("IR_ADS_DSCF_PACKED", "0")
    if "," in val:
        return False
    return val not in ("", "0")


def _pick_tile_r(h: int, w: int) -> int:
    """Largest row tile <= 8 whose q/o block passes the Mosaic block rule.

    The q/o blocks are (1, tile_r*w, GC): their second-to-last dim must be a
    multiple of 8 or equal the FULL h*w (the "equal to the overall array dim"
    escape).  E.g. (h, w) = (15, 20) has no divisor t with 8 | t*20, so the
    only legal tiling is the whole plane (tile_r = h) — that shape bit the
    round-2 bench (fell back to r1 with a lowering error) when the tile rule
    ignored w.
    """
    for t in range(min(8, h), 0, -1):
        if h % t == 0 and (t * w) % 8 == 0:
            return t
    return h


def pallas_dscf_attention_rows(
    q: jax.Array,      # (BG, h*w, GC)
    k: jax.Array,      # (BG, Mp, GC)
    v: jax.Array,      # (BG, Mp, GC)
    bias: jax.Array,   # (BG, hg, h, M, w) — rpe builder rows layout
    scale: float,
    hg: int,
    interpret: bool = False,
    packed: Optional[bool] = None,
) -> jax.Array:
    bg, hw, gc = q.shape
    mp = k.shape[1]
    _, _, h, m, w = bias.shape
    assert hw == h * w and m <= mp, (q.shape, k.shape, bias.shape)
    tile_r = _pick_tile_r(h, w)
    if packed is None:
        packed = _packed_rows_enabled()
    kernel = _dscf_rows_kernel_packed if packed else _dscf_rows_kernel

    out = pl.pallas_call(
        functools.partial(
            kernel, scale=scale, hg=hg, tile_r=tile_r, w=w, m=m
        ),
        out_shape=jax.ShapeDtypeStruct((bg, hw, gc), q.dtype),
        grid=(bg, h // tile_r),
        in_specs=[
            pl.BlockSpec((1, tile_r * w, gc), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, tile_r, m, w), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_r * w, gc), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or _env_interpret(),
    )(q, k, v, bias)
    return out


def dscf_rows_reference(q, k, v, bias, scale, hg):
    """XLA twin of the rows kernel (also its backward)."""
    bg, hw, gc = q.shape
    mp = k.shape[1]
    _, _, h, m, w = bias.shape
    # (BG, hg, h, M, w) -> packed (BG, HW, hg*Mp) with -inf padded keys
    b4 = bias.astype(jnp.float32).transpose(0, 2, 4, 1, 3)  # (BG, h, w, hg, M)
    b4 = jnp.pad(
        b4,
        ((0, 0), (0, 0), (0, 0), (0, 0), (0, mp - m)),
        constant_values=NEG_INF,
    )
    packed = b4.reshape(bg, hw, hg * mp).astype(q.dtype)
    return dscf_reference(q, k, v, packed, scale, hg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def dscf_attention_rows(q, k, v, bias, scale, hg, packed=None):
    """Fused forward (Pallas, rows layout) + XLA-recompute backward.

    ``packed=None`` reads IR_ADS_DSCF_PACKED (global 0/1); callers that know
    their pyramid level pass an explicit bool (see DAttentionMM — the packed
    kernel is numerics-validated at bench levels 0-2 but the level-3 shape
    (h=15, w=20: whole-plane tile, 7-row tail group) hits a Mosaic internal
    error, so the call site enables it per level)."""
    return pallas_dscf_attention_rows(q, k, v, bias, scale, hg, packed=packed)


def _rows_fwd(q, k, v, bias, scale, hg, packed=None):
    return (
        pallas_dscf_attention_rows(q, k, v, bias, scale, hg, packed=packed),
        (q, k, v, bias),
    )


def _rows_bwd(scale, hg, packed, res, g):
    q, k, v, bias = res
    if _dscf_bwd_mode() == "pallas":
        dq, dk, dv, dbias = pallas_dscf_rows_bwd(
            q, k, v, bias, g, scale, hg
        )
        return (
            dq,
            dk.astype(k.dtype),
            dv.astype(v.dtype),
            dbias.astype(bias.dtype),
        )
    _, vjp = jax.vjp(
        lambda a, b, c, d: dscf_rows_reference(a, b, c, d, scale, hg),
        q, k, v, bias,
    )
    return vjp(g)


dscf_attention_rows.defvjp(_rows_fwd, _rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def dscf_attention(q, k, v, bias, scale, hg):
    """Fused forward (Pallas) + XLA-recompute backward.

    See module docstring for the packed layout contract."""
    return pallas_dscf_attention(q, k, v, bias, scale, hg)


def _fwd(q, k, v, bias, scale, hg):
    return pallas_dscf_attention(q, k, v, bias, scale, hg), (q, k, v, bias)


def _bwd(scale, hg, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: dscf_reference(a, b, c, d, scale, hg), q, k, v, bias
    )
    return vjp(g)


dscf_attention.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# Fully-fused DSCF: rpe-bias construction + attention in ONE kernel.
#
# The rows pipeline (dscf_rpe_bias_rows -> dscf_attention_rows) still moves
# the (BG, hg, h, M, w) bias through HBM once in each direction (~1.1 GB
# across the four levels at 480p batch 8) and pays two kernels' scheduling.
# Here the bias for a band of query rows is built in VMEM scratch with the
# same hat-weight dots (ops/pallas_dscf_rpe semantics, including the
# store-dtype rounding) and consumed immediately by the same per-row
# attention as _dscf_rows_kernel.  The u intermediate is recomputed per
# band — at level 0 (4 bands) that costs ~0.4 ms of extra MXU against
# ~1.7 ms of bias traffic plus a whole kernel's scheduling saved.
# --------------------------------------------------------------------------


def _dscf_fused_kernel(
    pos_ref, table_ref, q_ref, k_ref, v_ref, o_ref, bias_scr, *,
    scale, hg, rows, w, m, s1, s2, jc, h, store_dtype,
):
    """Grid: (BG, h // rows).  Blocks:
    pos:   (1, M, 2) f32           table: (1, hg, s1, s2) f32
    q:     (1, rows*w, GC)         k/v:   (1, Mp, GC)
    o:     (1, rows*w, GC)         bias_scr: (rows, M, w) f32 scratch
    """
    band = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]
    mp = k.shape[0]
    gc = k.shape[-1]
    hc = gc // hg
    ay = (s1 - 1.0) / (2.0 * (h - 1.0))
    ax = (s2 - 1.0) / (2.0 * (w - 1.0))
    # base grids for the hat weights (see ops/pallas_dscf_rpe._rpe_rows_kernel)
    rr2 = jax.lax.broadcasted_iota(jnp.int32, (rows, s1), 0).astype(jnp.float32)
    s_2 = jax.lax.broadcasted_iota(jnp.int32, (rows, s1), 1).astype(jnp.float32)
    t2 = jax.lax.broadcasted_iota(jnp.int32, (s2, w), 0).astype(jnp.float32)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (s2, w), 1).astype(jnp.float32)
    r0 = (band * rows).astype(jnp.float32)
    base_y = ay * (rr2 + r0) - s_2  # (rows, s1)
    base_x = ax * c2 - t2           # (s2, w)

    # build the band's bias for ALL heads, j-chunk at a time (the hat
    # weights are head-independent — build them once per chunk)
    for j0 in range(0, m, jc):
        pos_c = pos_ref[0, j0 : j0 + jc]  # (jc, 2)
        by = (0.5 - 0.5 * pos_c[:, 0:1]) * 0.5 * (s1 - 1.0)  # (jc, 1)
        bx = (0.5 - 0.5 * pos_c[:, 1:2]) * 0.5 * (s2 - 1.0)
        cdt = store_dtype
        wy = jnp.maximum(
            0.0, 1.0 - jnp.abs(base_y[None] + by[:, :, None])
        ).astype(cdt)  # (jc, rows, s1)
        wxT = jnp.maximum(
            0.0, 1.0 - jnp.abs(base_x[None] + bx[:, :, None])
        ).astype(cdt)  # (jc, s2, w)
        for e in range(hg):
            u = jax.lax.dot_general(
                wxT, table_ref[0, e].astype(cdt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdt)  # (jc, w, s1)
            bias_c = jax.lax.dot_general(
                wy, u,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (jc, rows, w) f32
            # round to the store dtype (parity with the two-kernel path),
            # keep f32 in scratch for the adds below
            bias_scr[e, :, j0 : j0 + jc, :] = (
                bias_c.transpose(1, 0, 2).astype(cdt).astype(jnp.float32)
            )
    for e in range(hg):
        ke = k[:, e * hc : (e + 1) * hc]
        ve = v[:, e * hc : (e + 1) * hc]
        for rr in range(rows):
            qe = q_ref[0, rr * w : (rr + 1) * w, e * hc : (e + 1) * hc]
            sT = jax.lax.dot_general(
                ke,
                (qe * scale).astype(qe.dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Mp, w) key-major
            s = sT[:m] + bias_scr[e, rr]
            if mp != m:
                s = jnp.concatenate(
                    [s, jnp.full((mp - m, w), NEG_INF, jnp.float32)], axis=0
                )
            mx = jnp.max(s, axis=0, keepdims=True)
            ex = jnp.exp(s - mx)
            den = jnp.sum(ex, axis=0, keepdims=True)
            o = jax.lax.dot_general(
                ex.astype(ve.dtype), ve,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = o / den.reshape(w, 1)
            o_ref[0, rr * w : (rr + 1) * w, e * hc : (e + 1) * hc] = o.astype(
                o_ref.dtype
            )


def _pick_band_rows(h: int, w: int, m: int, hg: int) -> int:
    """Largest row band with (hg, rows, M, w) f32 scratch <= ~24 MB, rows
    dividing h and rows*w a sublane multiple."""
    budget = 24 * 1024 * 1024
    for rows in range(h, 0, -1):
        if h % rows or (rows * w) % 8:
            continue
        if hg * rows * m * w * 4 <= budget:
            return rows
    # No row count satisfies the (rows*w) % 8 sublane rule within budget
    # (e.g. h=15, w=20 at level 3).  Returning h here would build a block
    # shape that violates the stated Mosaic rule and crash mid-compile —
    # fail loudly instead so the caller falls back to the two-kernel/XLA
    # path.
    raise ValueError(
        f"pallas_dscf_attention_fused: no legal row band for "
        f"(h={h}, w={w}, m={m}, hg={hg}) — rows*w must be a multiple of 8 "
        f"within the VMEM budget; use the rows/XLA path for this shape"
    )


def pallas_dscf_attention_fused(
    q: jax.Array,      # (BG, h*w, GC)
    k: jax.Array,      # (BG, Mp, GC)
    v: jax.Array,      # (BG, Mp, GC)
    pos: jax.Array,    # (BG, M, 2) f32 (y, x) in [-1, 1]
    table: jax.Array,  # (G, hg, S1, S2) f32
    h: int,
    w: int,
    scale: float,
    hg: int,
    store_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    bg, hw, gc = q.shape
    mp = k.shape[1]
    m = pos.shape[1]
    g, _, s1, s2 = table.shape
    assert hw == h * w, (q.shape, h, w)
    rows = _pick_band_rows(h, w, m, hg)
    # j-chunk: multiple of 8 (sublane-aligned scratch stores) dividing M
    jc = None
    for cand in (120, 80, 40, 24, 16, 8):
        if m % cand == 0:
            jc = cand
            break
    jc = jc or m

    out = pl.pallas_call(
        functools.partial(
            _dscf_fused_kernel, scale=scale, hg=hg, rows=rows, w=w, m=m,
            s1=s1, s2=s2, jc=jc, h=h, store_dtype=store_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((bg, hw, gc), q.dtype),
        grid=(bg, h // rows),
        in_specs=[
            pl.BlockSpec((1, m, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, s1, s2), lambda i, j, g=g: (i % g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows * w, gc), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows * w, gc), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((hg, rows, m, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or _env_interpret(),
    )(pos, table, q, k, v)
    return out


def dscf_fused_reference(q, k, v, pos, table, h, w, scale, hg,
                         store_dtype=jnp.bfloat16):
    """XLA twin: the rows-layout builder reference + rows attention
    reference (identical rounding points)."""
    from ir_ads_tpu.ops.pallas_dscf_rpe import dscf_rpe_bias_rows_reference

    bias = dscf_rpe_bias_rows_reference(pos, table, h, w, store_dtype)
    return dscf_rows_reference(q, k, v, bias, scale, hg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def dscf_attention_fused(q, k, v, pos, table, h, w, scale, hg,
                         store_dtype=jnp.bfloat16):
    """Fused builder+attention forward + XLA-recompute backward."""
    return pallas_dscf_attention_fused(
        q, k, v, pos, table, h, w, scale, hg, store_dtype=store_dtype
    )


def _dscf_fused_fwd(q, k, v, pos, table, h, w, scale, hg, store_dtype):
    out = pallas_dscf_attention_fused(
        q, k, v, pos, table, h, w, scale, hg, store_dtype=store_dtype
    )
    return out, (q, k, v, pos, table)


def _dscf_fused_bwd(h, w, scale, hg, store_dtype, res, g):
    q, k, v, pos, table = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, e: dscf_fused_reference(
            a, b, c, d, e, h, w, scale, hg, store_dtype
        ),
        q, k, v, pos, table,
    )
    return vjp(g)


dscf_attention_fused.defvjp(_dscf_fused_fwd, _dscf_fused_bwd)


# --------------------------------------------------------------------------
# round-5: DSCF rows-attention BACKWARD kernel
#
# The custom_vjp backward above re-derives grads by jax.vjp of
# dscf_rows_reference, whose first act is a (BG, hg, h, M, w) -> packed
# f32 transpose of the bias — the r5f train profile shows that class
# (copy.10351/10352, convert_bitcast_fusion.8, fusion.1075/8545) costing
# ~8 ms of the 191 ms bs4 step, on top of the HBM-materialized score/
# softmax tensors.  This kernel recomputes the key-major scores in VMEM
# per row tile (same layout as the forward rows kernel, so the rpe bias
# adds with no transpose), and emits dq / dk / dv / dbias in the SAME
# layouts the forward consumed — dbias leaves in rows layout, feeding the
# rpe builder's backward directly, zero relayouts end to end.
# Math: d(softmax) vjp over the key (sublane) axis; same (row, head) slot
# packing as _dscf_rows_kernel_packed (full-128-lane contractions).
# --------------------------------------------------------------------------


def _dscf_rows_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref, *, scale, hg, tile_r, w, m,
):
    """Grid: (BG, h // tile_r).  Blocks mirror the forward kernel plus:
    do_ref (1, tile_r*w, GC) — output cotangent; dq_ref like q;
    dk_ref/dv_ref (1, Mp, GC) f32 accumulated across row tiles (constant
    block per bg); dbias_ref (1, hg, tile_r, m, w) f32."""
    k = k_ref[0]  # (Mp, GC)
    v = v_ref[0]
    mp = k.shape[0]
    gc = k.shape[-1]
    hc = gc // hg
    cdt = k.dtype

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    pr = max(1, min(tile_r, 128 // gc if gc <= 128 else 1))
    for r0 in range(0, tile_r, pr):
        prg = min(pr, tile_r - r0)
        p = prg * hg
        kc = jnp.tile(k, (1, prg))  # (Mp, p*hc)
        vc = jnp.tile(v, (1, prg))
        q_pieces = []
        do_pieces = []
        bias_cols = []
        for j in range(p):
            rr, e = r0 + j // hg, j % hg
            qe = q_ref[0, rr * w : (rr + 1) * w, e * hc : (e + 1) * hc]
            doe = do_ref[0, rr * w : (rr + 1) * w, e * hc : (e + 1) * hc]
            zl = jnp.zeros((w, j * hc), cdt)
            zr = jnp.zeros((w, (p - 1 - j) * hc), cdt)

            def bd(t, zl=zl, zr=zr, p=p):
                return t if p == 1 else jnp.concatenate(
                    [a for a in (zl, t, zr) if a.shape[1]], axis=1
                )

            q_pieces.append(bd(qe))
            do_pieces.append(bd(doe))
            bias_cols.append(bias_ref[0, e, rr].astype(jnp.float32))
        q_bd = q_pieces[0] if p == 1 else jnp.concatenate(q_pieces, axis=0)
        do_bd = (
            do_pieces[0] if p == 1 else jnp.concatenate(do_pieces, axis=0)
        )  # (p*w, p*hc)
        bias_tall = (
            bias_cols[0] if p == 1 else jnp.concatenate(bias_cols, axis=1)
        )  # (M, p*w)
        sT = jax.lax.dot_general(
            kc, q_bd,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Mp, p*w) f32, key-major
        s = sT[:m] * scale + bias_tall
        if mp != m:
            s = jnp.concatenate(
                [s, jnp.full((mp - m, p * w), NEG_INF, jnp.float32)], axis=0
            )
        mx = jnp.max(s, axis=0, keepdims=True)
        ex = jnp.exp(s - mx)
        den = jnp.sum(ex, axis=0, keepdims=True)
        prb = ex / den  # (Mp, p*w) f32
        pc = prb.astype(cdt)
        # dV: contract the p*w slot rows — lane block j = P_j @ dO_j
        dv_full = jax.lax.dot_general(
            pc, do_bd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Mp, p*hc)
        # (Mp, prg*gc) -> (Mp, gc): summing lane blocks via static
        # slices — a lane-splitting reshape is an unsupported Mosaic
        # shape cast (the r5g compile failure)
        dv_acc = dv_full[:, :gc]
        for jj in range(1, prg):
            dv_acc = dv_acc + dv_full[:, jj * gc : (jj + 1) * gc]
        dv_ref[0] = dv_ref[0] + dv_acc
        # dP: lane contraction against tiled V — column block j = V_e dO_j^T
        dp = jax.lax.dot_general(
            vc, do_bd,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Mp, p*w)
        ds = prb * (dp - jnp.sum(dp * prb, axis=0, keepdims=True))
        # dbias in rows layout, no transpose
        for j in range(p):
            rr, e = r0 + j // hg, j % hg
            dbias_ref[0, e, rr] = ds[:m, j * w : (j + 1) * w]
        ds_c = (ds * scale).astype(cdt)
        # dQ: contract keys; diagonal (slot, slot) blocks -> (w, gc)/row
        dq_full = jax.lax.dot_general(
            ds_c, kc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (p*w, p*hc)
        if p == 1:
            red = dq_full
        else:
            osel = (
                jax.lax.broadcasted_iota(jnp.int32, (p, 1, p * hc), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (p, 1, p * hc), 2)
                // hc
            ).astype(jnp.float32)
            red = jnp.sum(dq_full.reshape(p, w, p * hc) * osel, axis=0)
        for rr in range(r0, r0 + prg):
            dq_ref[0, rr * w : (rr + 1) * w, :] = red[
                :, (rr - r0) * gc : (rr - r0 + 1) * gc
            ].astype(dq_ref.dtype)
        # dK: contract slot rows — lane block j = dS_j @ Q_j
        dk_full = jax.lax.dot_general(
            ds_c, q_bd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Mp, p*hc)
        dk_acc = dk_full[:, :gc]
        for jj in range(1, prg):
            dk_acc = dk_acc + dk_full[:, jj * gc : (jj + 1) * gc]
        dk_ref[0] = dk_ref[0] + dk_acc


def pallas_dscf_rows_bwd(
    q: jax.Array,      # (BG, h*w, GC)
    k: jax.Array,      # (BG, Mp, GC)
    v: jax.Array,      # (BG, Mp, GC)
    bias: jax.Array,   # (BG, hg, h, M, w)
    dout: jax.Array,   # (BG, h*w, GC)
    scale: float,
    hg: int,
    interpret: bool = False,
):
    """Returns (dq cdt, dk f32, dv f32, dbias f32) in the forward's own
    layouts."""
    bg, hw, gc = q.shape
    mp = k.shape[1]
    _, _, h, m, w = bias.shape
    tile_r = _pick_tile_r(h, w)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(
            _dscf_rows_bwd_kernel, scale=scale, hg=hg, tile_r=tile_r,
            w=w, m=m,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bg, hw, gc), q.dtype),
            jax.ShapeDtypeStruct((bg, mp, gc), jnp.float32),
            jax.ShapeDtypeStruct((bg, mp, gc), jnp.float32),
            jax.ShapeDtypeStruct((bg, hg, h, m, w), jnp.float32),
        ],
        grid=(bg, h // tile_r),
        in_specs=[
            pl.BlockSpec((1, tile_r * w, gc), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, tile_r, m, w), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r * w, gc), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r * w, gc), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, gc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, tile_r, m, w), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret or _env_interpret(),
    )(q, k, v, bias, dout)
    return dq, dk, dv, dbias


def _dscf_bwd_mode() -> str:
    """Default auto (pallas on TPU): the original lane-splitting reshape
    crashed Mosaic's infer-vector-layout (dev/logs/r5g.log); after the
    static-slice-add rewrite the kernel compiles and runs on the relay
    (L0 4.97 ms / L1 3.63 ms standalone, /tmp/probe_f.log) and the
    in-context adapter-recipe train step measured 151.1 -> 137.2 ms with
    it on (dev/logs + /tmp/train_dscfbwd.log, 2026-08-21)."""
    import os

    mode = os.environ.get("IR_ADS_DSCF_BWD", "auto")
    if mode in ("xla", "pallas"):
        return mode
    if os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1":
        return "pallas"
    import jax as _jax

    return "pallas" if _jax.default_backend() == "tpu" else "xla"
