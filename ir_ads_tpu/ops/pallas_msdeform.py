"""Pallas multi-scale deformable-attention sampling kernel (TPU).

TPU-native replacement for the reference's CUDA im2col kernel
(detrex/layers/csrc/MsDeformAttn/ms_deform_im2col_cuda.cuh, registered in
vision.cpp:54-57) — the op every DINO encoder/decoder layer runs.  The
XLA-gather formulation (detection/msdeform_attn.ms_deform_attn) is exact
but lowers to per-pixel gathers that made DINO-R50 2000q/800x1216 run at
699.9 ms/forward on v5e (BENCH_r03).  This kernel reformulates the whole
op around ``tpu.dynamic_gather`` (the take-along-axis form Mosaic lowers
for 8/16/32-bit types along the second-minor dimension):

  * All (level, point, corner) samples of a query tile become ROWS of one
    big in-VMEM gather: out[i, j] = value[idx[i, j], j].  The multi-level
    value stack (sum HW, heads*D) lives in VMEM once per batch element and
    is reused across query tiles (Pallas keeps the block when the index
    map returns the same block id).
  * Bilinear corner indices/weights are computed OUTSIDE the kernel by XLA
    (fused elementwise, (B, Lq*L*P*4, heads) arrays — 32 B/corner-slot of
    HBM traffic instead of the gather's pathological lowering), laid out
    q-major/corner-minor so the in-kernel reduction is a single
    sublane-aligned reshape-sum.
  * Attention weighting folds into the same pass: the gathered corner
    value is multiplied by (bilinear corner weight x attention weight)
    and summed over the 4*L*P corner slots per query.

Zero-padding semantics match F.grid_sample(padding_mode='zeros',
align_corners=False): out-of-bounds corners get weight 0 (index clamped
in-level so the gather stays in bounds).

Backward: custom_vjp whose backward is JAX autodiff of the XLA reference
implementation (gather -> scatter-add transpose), i.e. gradients identical
to detection/msdeform_attn (itself gradient-tested vs the torch fallback
of the reference, tests/test_msdeform.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ir_ads_tpu.detection.msdeform_attn import (
    ms_deform_attn_xla as _xla_reference,
)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _corner_tables(
    spatial_shapes: Sequence[Tuple[int, int]],
    locations: jax.Array,  # (B, Lq, H, L, P, 2) in [0, 1]
    weights: jax.Array,  # (B, Lq, H, L, P)
):
    """Flat corner indices + combined weights, q-major / corner-minor.

    Returns (idx, wgt): (B, Lq, L*P*4, H) int32 / float32.  Index is into
    the level-concatenated (padded) value stack; weight is
    bilinear_corner_weight * attention_weight, zeroed for out-of-bounds
    corners (grid_sample zeros padding).
    """
    # (B, Lq, L, P, H, 2): heads minor so the kernel's lane layout falls
    # out of a single reshape
    loc = locations.transpose(0, 1, 3, 4, 2, 5).astype(jnp.float32)
    att = weights.transpose(0, 1, 3, 4, 2).astype(jnp.float32)

    idx_parts = []
    wgt_parts = []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        gx = loc[:, :, lvl, :, :, 0] * w - 0.5  # align_corners=False
        gy = loc[:, :, lvl, :, :, 1] * h - 0.5
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        fx = gx - x0
        fy = gy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        a = att[:, :, lvl]  # (B, Lq, P, H)

        lvl_idx = []
        lvl_wgt = []
        for dy, dx, cw in (
            (0, 0, (1 - fx) * (1 - fy)),
            (0, 1, fx * (1 - fy)),
            (1, 0, (1 - fx) * fy),
            (1, 1, fx * fy),
        ):
            xi = x0i + dx
            yi = y0i + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xc = jnp.clip(xi, 0, w - 1)
            yc = jnp.clip(yi, 0, h - 1)
            lvl_idx.append(start + yc * w + xc)  # (B, Lq, P, H)
            lvl_wgt.append(jnp.where(valid, cw, 0.0) * a)
        # (B, Lq, P, 4, H): corner minor within point
        idx_parts.append(jnp.stack(lvl_idx, axis=3))
        wgt_parts.append(jnp.stack(lvl_wgt, axis=3))
        start += h * w

    # (B, Lq, L, P, 4, H) -> (B, Lq, L*P*4, H)
    idx = jnp.stack(idx_parts, axis=2)
    wgt = jnp.stack(wgt_parts, axis=2)
    b, lq = idx.shape[:2]
    ncorner = idx.shape[2] * idx.shape[3] * idx.shape[4]
    nheads = idx.shape[5]
    return (
        idx.reshape(b, lq, ncorner, nheads),
        wgt.reshape(b, lq, ncorner, nheads),
    )


def _gather_kernel(i_ref, w_ref, v_ref, o_ref, *, heads, d, ncorner, f32_chunks):
    s_pad, hd = v_ref.shape[1], v_ref.shape[2]
    v = v_ref[0]  # (S, HD)
    idx = i_ref[0, 0]  # (S, H) int32
    wgt = w_ref[0, 0]  # (S, H) f32

    # lane-broadcast the per-head index/weight columns across each head's
    # D value lanes: (rows, H) -> (rows, H*D)
    def lane_expand(a):
        rows = a.shape[0]
        parts = [
            jax.lax.broadcast_in_dim(a[:, hh : hh + 1], (rows, d), (0, 1))
            for hh in range(heads)
        ]
        return parts[0] if heads == 1 else jnp.concatenate(parts, axis=1)

    idx_full = lane_expand(idx)
    g = jnp.take_along_axis(v, idx_full, axis=0)  # tpu.dynamic_gather dim0

    # weight + reduce in f32, chunked over rows to bound VMEM
    t = s_pad // ncorner
    tc = t // f32_chunks
    outs = []
    for c0 in range(0, t, tc):
        rows = slice(c0 * ncorner, (c0 + tc) * ncorner)
        gw = g[rows].astype(jnp.float32) * lane_expand(wgt[rows])
        outs.append(jnp.sum(gw.reshape(tc, ncorner, hd), axis=1))
    o = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _pallas_forward(
    value: jax.Array,  # (B, S, H, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    locations: jax.Array,  # (B, Lq, H, L, P, 2)
    weights: jax.Array,  # (B, Lq, H, L, P)
    interpret: bool = False,
) -> jax.Array:
    b, s, heads, d = value.shape
    lq = locations.shape[1]
    n_levels = len(spatial_shapes)
    n_points = locations.shape[4]
    ncorner = n_levels * n_points * 4
    hd = heads * d

    # pad the value stack so rows-per-gather == S_pad is a multiple of the
    # per-query corner-slot count AND of the 8-sublane tile
    import math as _math

    m = ncorner * 8 // _math.gcd(ncorner, 8)
    s_pad = _round_up(s, m)
    t = s_pad // ncorner  # queries per tile
    n_tiles = -(-lq // t)
    lq_pad = n_tiles * t

    idx, wgt = _corner_tables(spatial_shapes, locations, weights)
    if lq_pad != lq:
        pad = [(0, 0), (0, lq_pad - lq), (0, 0), (0, 0)]
        idx = jnp.pad(idx, pad)
        wgt = jnp.pad(wgt, pad)
    idx = idx.reshape(b, n_tiles, s_pad, heads)
    wgt = wgt.reshape(b, n_tiles, s_pad, heads).astype(jnp.float32)

    v2 = value.reshape(b, s, hd)
    if s_pad != s:
        v2 = jnp.pad(v2, [(0, 0), (0, s_pad - s), (0, 0)])

    # f32 temporaries per chunk stay ~2*S_pad/f32_chunks*HD*4B
    import os as _os

    f32_chunks = int(_os.environ.get("IR_ADS_MSDEFORM_CHUNKS", "0") or 0)
    if not f32_chunks:
        f32_chunks = 1
        while (2 * s_pad * hd * 4) // f32_chunks > 24 * 1024 * 1024:
            f32_chunks *= 2
    while f32_chunks > 1 and t % f32_chunks:
        f32_chunks //= 2

    kern = functools.partial(
        _gather_kernel, heads=heads, d=d, ncorner=ncorner, f32_chunks=f32_chunks
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, t, hd), value.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, s_pad, heads),
                lambda bb, tt: (bb, tt, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, heads),
                lambda bb, tt: (bb, tt, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s_pad, hd), lambda bb, tt: (bb, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t, hd), lambda bb, tt: (bb, tt, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx, wgt, v2)
    out = out.reshape(b, lq_pad, hd)
    if lq_pad != lq:
        out = out[:, :lq]
    return out


def _fwd(value, spatial_shapes, locations, weights, interpret):
    return (
        _pallas_forward(value, spatial_shapes, locations, weights, interpret),
        (value, locations, weights),
    )


def _bwd(spatial_shapes, interpret, res, g):
    value, locations, weights = res
    _, vjp = jax.vjp(
        lambda v, l, w: _xla_reference(v, spatial_shapes, l, w),
        value,
        locations,
        weights,
    )
    dv, dl, dw = vjp(g)
    return dv, dl, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_pallas(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    locations: jax.Array,
    weights: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for detection.msdeform_attn.ms_deform_attn.

    value: (B, sum(HW), heads, head_dim); locations in [0, 1]; returns
    (B, Lq, heads*head_dim).  Forward runs the Pallas dynamic-gather
    kernel; backward is JAX autodiff of the XLA reference.
    """
    return _pallas_forward(value, spatial_shapes, locations, weights, interpret)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
