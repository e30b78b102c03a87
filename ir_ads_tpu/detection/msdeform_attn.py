"""Multi-scale deformable attention (Deformable-DETR / DINO core op).

TPU-native equivalent of the reference's CUDA kernel
(detrex/layers/csrc/MsDeformAttn/ms_deform_im2col_cuda.cuh) and its
pure-torch fallback (detrex/layers/multi_scale_deform_attn.py:96-138):
per-level bilinear sampling at learned offsets x softmax attention weights.

Design notes:
  * Spatial shapes are STATIC (python tuples) — each level's sampling is an
    independent batched gather that XLA fuses; no level_start_index
    bookkeeping on device.
  * Sampling uses align_corners=False + zeros padding exactly like
    F.grid_sample defaults in the fallback (and the CUDA kernel's border
    handling).
  * Differentiable via JAX autodiff (gather -> scatter-add transpose); the
    reference's hand-written CUDA backward is the spec the autodiff
    gradients are tested against (tests/test_msdeform.py, gradcheck-style).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ir_ads_tpu.ops.grid_sample import grid_sample

Dtype = Any


def ms_deform_attn(
    value: jax.Array,  # (B, sum(H*W), heads, head_dim)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H, W), ...]
    sampling_locations: jax.Array,  # (B, Lq, heads, levels, points, 2) in [0,1]
    attention_weights: jax.Array,  # (B, Lq, heads, levels, points)
) -> jax.Array:
    """Returns (B, Lq, heads * head_dim).

    Dispatch (IR_ADS_MSDEFORM env, read at trace time):
      'xla4'   mixed 2x2-patch slice gather (big levels) + fused one-hot
               MXU dots (small levels) — the measured-best form on the
               relay toolchain (dev/probe_msd2.py, COVERAGE round-4)
      'xla3'   all levels as chunked one-hot MXU dots
      'xla2'   ONE take_along_axis on the level-concat stack
      'xla'    per-level grid_sample gathers (the r1-r3 form)
      'pallas' the dynamic-gather kernel (ops/pallas_msdeform.py) —
               opt-in only: the relay toolchain cannot lower ANY
               in-kernel dynamic gather (dev/probe_dyngather.py)
      'auto'   (default) resolves to xla4 on TPU, xla elsewhere
    """
    import os

    impl = os.environ.get("IR_ADS_MSDEFORM", "auto")
    if impl == "auto":
        impl = "xla4" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from ir_ads_tpu.ops.pallas_msdeform import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, tuple(map(tuple, spatial_shapes)),
            sampling_locations, attention_weights,
        )
    if impl == "xla4":
        # Under autodiff the patch-slice gather's transpose is a 2x2-slice
        # scatter-add (operand_batching_dims) that crashes the relay's
        # tpu_compile_helper (dev/probe_dino_train_ladder.py: sumloss
        # fails with xla4, compiles with xla).  The custom_vjp below keeps
        # the fast forward and recomputes the backward through the plain
        # per-element formulation (identical math -> identical grads).
        bwd = os.environ.get("IR_ADS_MSDEFORM_BWD", "level")
        if bwd == "level":
            # round-5 default: per-level backward — small levels
            # differentiate through the one-hot dots natively (MXU both
            # directions), big levels use the plain per-corner backward
            return ms_deform_attn_xla5(
                value, tuple(map(tuple, spatial_shapes)),
                sampling_locations, attention_weights,
            )
        if bwd == "xla":
            return _ms_deform_attn_xla4_xlabwd(
                tuple(map(tuple, spatial_shapes)),
                value, sampling_locations, attention_weights,
            )
        return ms_deform_attn_xla4(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    fn = {
        "xla": ms_deform_attn_xla,
        "xla2": ms_deform_attn_xla2,
        "xla3": ms_deform_attn_xla3,
    }[impl]
    return fn(
        value, spatial_shapes, sampling_locations, attention_weights
    )


def ms_deform_attn_xla(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """XLA-gather formulation (grid_sample per level); exact reference."""
    b, _, n_heads, head_dim = value.shape
    _, lq, _, n_levels, n_points, _ = sampling_locations.shape
    grids = 2 * sampling_locations - 1  # [0,1] -> [-1,1]

    start = 0
    sampled = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start : start + h * w]  # (B, HW, heads, D)
        start += h * w
        # (B*heads, H, W, D) NHWC
        v = v.transpose(0, 2, 1, 3).reshape(b * n_heads, h, w, head_dim)
        g = grids[:, :, :, lvl].transpose(0, 2, 1, 3, 4)  # (B, heads, Lq, P, 2)
        g = g.reshape(b * n_heads, lq, n_points, 2)
        s = grid_sample(v, g, align_corners=False, padding_zero=True)
        sampled.append(s)  # (B*heads, Lq, P, D)

    # (B*heads, Lq, levels, P, D)
    stacked = jnp.stack(sampled, axis=2)
    w = attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        b * n_heads, lq, n_levels, n_points
    )
    out = jnp.einsum(
        "blpnd,blpn->bld",
        stacked.reshape(b * n_heads, lq, n_levels, n_points, head_dim),
        w.astype(stacked.dtype),
        preferred_element_type=jnp.float32,
    ).astype(value.dtype)
    out = out.reshape(b, n_heads, lq, head_dim).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, n_heads * head_dim)


def ms_deform_attn_xla2(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Single-gather formulation: same math as :func:`ms_deform_attn_xla`
    but all (level, point, corner) samples become ONE take_along_axis on
    the level-concatenated value stack, with bilinear-corner x attention
    weights folded into the same reduce.  16 gathers/call -> 1.
    """
    from ir_ads_tpu.ops.pallas_msdeform import _corner_tables

    b, s, n_heads, head_dim = value.shape
    lq = sampling_locations.shape[1]
    idx, wgt = _corner_tables(spatial_shapes, sampling_locations, attention_weights)
    ncorner = idx.shape[2]
    # (B, Lq, NC, H) -> (B*H, Lq*NC)
    idx = idx.transpose(0, 3, 1, 2).reshape(b * n_heads, lq * ncorner)
    wgt = wgt.transpose(0, 3, 1, 2).reshape(b * n_heads, lq, ncorner)
    v = value.transpose(0, 2, 1, 3).reshape(b * n_heads, s, head_dim)
    g = jnp.take_along_axis(v, idx[..., None], axis=1)
    g = g.reshape(b * n_heads, lq, ncorner, head_dim)
    out = jnp.einsum(
        "blnd,bln->bld",
        g,
        wgt.astype(g.dtype),
        preferred_element_type=jnp.float32,
    ).astype(value.dtype)
    out = out.reshape(b, n_heads, lq, head_dim).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, n_heads * head_dim)


def _gather_onehot(v: jax.Array, idx: jax.Array, chunk: int = 2048):
    """Row gather as chunked one-hot MXU matmuls.

    v: (G, S, D); idx: (G, N) int32 in [0, S) -> (G, N, D).

    On the TPU relay toolchain a plain take_along_axis of these shapes
    runs at ~10 GB/s effective (4.25 ms for a 41 MB gather at encoder
    scale) and takes ~18 min to compile, while the same gather written as
    one_hot @ v measures ~0 ms: XLA fuses the iota-compare one-hot
    generation into the dot, so the "matrix" never exists and the MXU
    does the routing (dev/probe_msd2.py, COVERAGE round-4).  Chunking the
    S dimension bounds the fused operand so the pattern survives at
    level-0 sizes (S = 15200).
    """
    g, s, d = v.shape
    n = idx.shape[1]
    if s <= chunk:
        oh = jax.nn.one_hot(idx, s, dtype=v.dtype)  # (G, N, S) — fused
        return jax.lax.dot_general(
            oh, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
    acc = jnp.zeros((g, n, d), jnp.float32)
    for c0 in range(0, s, chunk):
        cw = min(chunk, s - c0)
        oh = jax.nn.one_hot(idx - c0, cw, dtype=v.dtype)
        acc += jax.lax.dot_general(
            oh, v[:, c0 : c0 + cw],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    return acc.astype(v.dtype)


def ms_deform_attn_xla3(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """One-hot-matmul formulation: per-level corner samples gathered by
    chunked one-hot MXU dots (see :func:`_gather_onehot`), bilinear-corner
    x attention weights folded into one reduce.  Exact same math as
    :func:`ms_deform_attn_xla`; built for the TPU relay toolchain where
    both XLA row gathers and Mosaic dynamic gathers are unusable."""
    from ir_ads_tpu.ops.pallas_msdeform import _corner_tables

    b, s, n_heads, head_dim = value.shape
    lq = sampling_locations.shape[1]
    n_levels = len(spatial_shapes)
    n_points = sampling_locations.shape[4]
    nc_lvl = n_points * 4
    idx, wgt = _corner_tables(
        spatial_shapes, sampling_locations, attention_weights
    )  # (B, Lq, L*P*4, H), level-major corner slots
    # (B, Lq, L, P*4, H) -> (B*H, L, Lq*P*4)
    idx = idx.reshape(b, lq, n_levels, nc_lvl, n_heads)
    wgt = wgt.reshape(b, lq, n_levels, nc_lvl, n_heads)
    idx = idx.transpose(0, 4, 2, 1, 3).reshape(b * n_heads, n_levels, -1)
    wgt = wgt.transpose(0, 4, 2, 1, 3).reshape(b * n_heads, n_levels, -1)
    v = value.transpose(0, 2, 1, 3).reshape(b * n_heads, s, head_dim)

    out = jnp.zeros((b * n_heads, lq, head_dim), jnp.float32)
    start = 0
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        gl = _gather_onehot(v[:, start : start + hh * ww], idx[:, lvl] - start)
        gl = gl.reshape(b * n_heads, lq, nc_lvl, head_dim)
        out += jnp.einsum(
            "blnd,bln->bld",
            gl,
            wgt[:, lvl].reshape(b * n_heads, lq, nc_lvl).astype(gl.dtype),
            preferred_element_type=jnp.float32,
        )
        start += hh * ww
    out = out.astype(value.dtype)
    out = out.reshape(b, n_heads, lq, head_dim).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, n_heads * head_dim)


def _corner_einsum_flat() -> bool:
    """Corner-weighting einsum form: flat (P*4)-contraction (lane-aligned)
    vs the (P, 2, 2) shape.  Both are exact.  Default pyx — the form
    behind the recorded 248.7 ms r4 forward; the flat form's in-context
    readings (277.1/280.1, dev/logs/r5i.log + r5g.log) never beat it and
    the r5j A/B died in a stuck remote compile, so flat stays opt-in
    (IR_ADS_MSDEFORM_EINSUM=flat) pending a clean measurement."""
    import os

    return os.environ.get("IR_ADS_MSDEFORM_EINSUM", "pyx") != "pyx"


def _patch_tables(h: int, w: int, gxy: jax.Array, att: jax.Array):
    """Per-level 2x2-patch gather tables.

    gxy: (..., 2) continuous (gx, gy) in pixel coords (align_corners=False
    grid already applied); att: (...) attention weight.  Returns
    (ys, xs, cellw): patch start rows/cols (int32, clamped so the 2x2
    patch stays in bounds) and per-cell weights (..., 2, 2) with
    bilinear-corner x attention folded and out-of-bounds corners zeroed
    (grid_sample zeros padding).  A corner that the clamp pushes out of
    the patch is out of bounds by construction, so its weight is 0 and
    the misplaced read is harmless.
    """
    gx = gxy[..., 0]
    gy = gxy[..., 1]
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xs = jnp.clip(x0i, 0, max(w - 2, 0))
    ys = jnp.clip(y0i, 0, max(h - 2, 0))

    def axis_cells(f, i0, start, size):
        # 2-tap weights [1-f, f] at coords (i0, i0+1), zeroed out of
        # bounds, placed at patch cells (i0 - start, i0 + 1 - start)
        wa = jnp.where((i0 >= 0) & (i0 < size), 1.0 - f, 0.0)
        wb = jnp.where((i0 + 1 >= 0) & (i0 + 1 < size), f, 0.0)
        o = i0 - start  # in {-1, 0, 1}
        cell0 = jnp.where(o == 0, wa, jnp.where(o == -1, wb, 0.0))
        cell1 = jnp.where(o == 0, wb, jnp.where(o == 1, wa, 0.0))
        return jnp.stack([cell0, cell1], axis=-1)  # (..., 2)

    cy = axis_cells(fy, y0i, ys, h)  # (..., 2)
    cx = axis_cells(fx, x0i, xs, w)  # (..., 2)
    cellw = cy[..., :, None] * cx[..., None, :] * att[..., None, None]
    return ys, xs, cellw


def _gather_patch2x2(v4: jax.Array, ys: jax.Array, xs: jax.Array):
    """v4: (G, H, W, D); ys/xs: (G, N) int32 patch starts (in bounds) ->
    (G, N, 2, 2, D) via ONE gather row per sample (slice_sizes (1,2,2,D)),
    ~4x fewer gather descriptors than per-corner take_along_axis on the
    row-rate-bound TPU gather engine (dev/probe_msd2.py)."""
    g, h, w, d = v4.shape
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        v4, jnp.stack([ys, xs], axis=-1), dn, slice_sizes=(1, 2, 2, d),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def ms_deform_attn_xla4(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    onehot_max_hw: int = 1024,
) -> jax.Array:
    """Mixed formulation tuned to the TPU gather engine: levels with
    HW > onehot_max_hw sample via ONE 2x2-patch slice gather per (query,
    point) (row-rate-bound engine -> 4x fewer descriptors than per-corner
    takes); small levels via fused one-hot MXU dots (measured ~free,
    dev/probe_msd2.py).  Exact same math as :func:`ms_deform_attn_xla`."""
    b, s, n_heads, head_dim = value.shape
    _, lq, _, n_levels, n_points, _ = sampling_locations.shape
    loc = sampling_locations.transpose(0, 2, 1, 3, 4, 5).reshape(
        b * n_heads, lq, n_levels, n_points, 2
    )
    att = attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        b * n_heads, lq, n_levels, n_points
    ).astype(jnp.float32)
    vt = value.transpose(0, 2, 1, 3).reshape(b * n_heads, s, head_dim)

    out = jnp.zeros((b * n_heads, lq, head_dim), jnp.float32)
    start = 0
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        vl = vt[:, start : start + hh * ww]
        # align_corners=False pixel coords
        gxy = jnp.stack(
            [
                loc[:, :, lvl, :, 0].astype(jnp.float32) * ww - 0.5,
                loc[:, :, lvl, :, 1].astype(jnp.float32) * hh - 0.5,
            ],
            axis=-1,
        )  # (G, Lq, P, 2)
        if hh * ww > onehot_max_hw and hh >= 2 and ww >= 2:
            ys, xs, cellw = _patch_tables(hh, ww, gxy, att[:, :, lvl])
            patches = _gather_patch2x2(
                vl.reshape(-1, hh, ww, head_dim),
                ys.reshape(b * n_heads, lq * n_points),
                xs.reshape(b * n_heads, lq * n_points),
            )
            if _corner_einsum_flat():
                # (P, 2, 2) flattened onto one contraction axis: keeps
                # head_dim on lanes (see _patch_level_contrib)
                out += jnp.einsum(
                    "blcd,blc->bld",
                    patches.reshape(
                        b * n_heads, lq, n_points * 4, head_dim
                    ).astype(jnp.float32),
                    cellw.reshape(b * n_heads, lq, n_points * 4),
                    preferred_element_type=jnp.float32,
                )
            else:
                out += jnp.einsum(
                    "blpyxd,blpyx->bld",
                    patches.reshape(
                        b * n_heads, lq, n_points, 2, 2, head_dim
                    ).astype(jnp.float32),
                    cellw,
                    preferred_element_type=jnp.float32,
                )
        else:
            # corner tables for this level only (one-hot MXU routing)
            gx = gxy[..., 0]
            gy = gxy[..., 1]
            x0 = jnp.floor(gx)
            y0 = jnp.floor(gy)
            fx = (gx - x0)[..., None]
            fy = (gy - y0)[..., None]
            x0i = x0.astype(jnp.int32)[..., None]
            y0i = y0.astype(jnp.int32)[..., None]
            dxy = jnp.array([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.int32)
            xi = x0i + dxy[None, None, None, :, 1]
            yi = y0i + dxy[None, None, None, :, 0]
            valid = (xi >= 0) & (xi < ww) & (yi >= 0) & (yi < hh)
            cw = jnp.where(
                dxy[None, None, None, :, 1] == 0, 1.0 - fx, fx
            ) * jnp.where(dxy[None, None, None, :, 0] == 0, 1.0 - fy, fy)
            wgt = jnp.where(valid, cw, 0.0) * att[:, :, lvl][..., None]
            idx = jnp.clip(yi, 0, hh - 1) * ww + jnp.clip(xi, 0, ww - 1)
            nc = n_points * 4
            gl = _gather_onehot(
                vl, idx.reshape(b * n_heads, lq * nc)
            ).reshape(b * n_heads, lq, nc, head_dim)
            out += jnp.einsum(
                "blnd,bln->bld",
                gl,
                wgt.reshape(b * n_heads, lq, nc).astype(gl.dtype),
                preferred_element_type=jnp.float32,
            )
        start += hh * ww
    out = out.astype(value.dtype)
    out = out.reshape(b, n_heads, lq, head_dim).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, n_heads * head_dim)


def _plain_level_contrib(vl, hh, ww, loc_l, att_l):
    """Plain per-corner-take bilinear contribution of ONE level
    (differentiable: its backward lowers to per-element gathers +
    scatter-adds, which the relay toolchain compiles).

    vl (G, HW, D); loc_l (G, Lq, P, 2) in [0,1] (x, y); att_l (G, Lq, P)
    f32 -> (G, Lq, D) f32.  Exactly the math of the xla4 patch branch
    (grid_sample align_corners=False with zero padding x attention)."""
    g_, hw, d = vl.shape
    gx = loc_l[..., 0].astype(jnp.float32) * ww - 0.5
    gy = loc_l[..., 1].astype(jnp.float32) * hh - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    out = jnp.zeros((g_, loc_l.shape[1], d), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            valid = (xi >= 0) & (xi < ww) & (yi >= 0) & (yi < hh)
            wgt = jnp.where(
                valid,
                (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy),
                0.0,
            ) * att_l  # (G, Lq, P)
            idx = jnp.clip(yi, 0, hh - 1) * ww + jnp.clip(xi, 0, ww - 1)
            rows = jnp.take_along_axis(
                vl, idx.reshape(g_, -1)[..., None], axis=1
            ).reshape(g_, *idx.shape[1:], d)
            out = out + jnp.einsum(
                "blpd,blp->bld", rows.astype(jnp.float32), wgt,
                preferred_element_type=jnp.float32,
            )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _patch_level_contrib(hh, ww, vl4, loc_l, att_l):
    """One big level's contribution: 2x2-patch slice gather forward (the
    xla4 form) with the plain per-corner backward (the patch gather's
    native transpose is a 2x2-slice scatter-add that crashes the relay's
    compile helper)."""
    g_, lq, p = att_l.shape
    gxy = jnp.stack(
        [
            loc_l[..., 0].astype(jnp.float32) * ww - 0.5,
            loc_l[..., 1].astype(jnp.float32) * hh - 0.5,
        ],
        axis=-1,
    )
    ys, xs, cellw = _patch_tables(hh, ww, gxy, att_l)
    d = vl4.shape[-1]
    patches = _gather_patch2x2(
        vl4, ys.reshape(g_, lq * p), xs.reshape(g_, lq * p)
    )
    if _corner_einsum_flat():
        # Corner weighting as a (P*4)-contraction with head_dim on the
        # minor (lane) axis.  The (..., P, 2, 2) form profiled
        # 2.0-2.3 ms/layer at 800x1216 (r5f dino fwd profile,
        # multiply_reduce_fusion.25-28): XLA laid the reduce out with the
        # size-2 corner dims minor — 2 of 128 lanes busy.  (P, 2, 2) are
        # adjacent dims, so this reshape is free.
        return jnp.einsum(
            "blcd,blc->bld",
            patches.reshape(g_, lq, p * 4, d).astype(jnp.float32),
            cellw.reshape(g_, lq, p * 4),
            preferred_element_type=jnp.float32,
        )
    return jnp.einsum(
        "blpyxd,blpyx->bld",
        patches.reshape(g_, lq, p, 2, 2, d).astype(jnp.float32),
        cellw,
        preferred_element_type=jnp.float32,
    )


def _plc_fwd(hh, ww, vl4, loc_l, att_l):
    return _patch_level_contrib(hh, ww, vl4, loc_l, att_l), (
        vl4, loc_l, att_l,
    )


def _plc_bwd(hh, ww, res, g):
    vl4, loc_l, att_l = res
    g_, _, _, d = vl4.shape

    def plain(v4, l, a):
        return _plain_level_contrib(
            v4.reshape(g_, hh * ww, d), hh, ww, l, a
        )

    _, vjp = jax.vjp(plain, vl4, loc_l, att_l)
    return vjp(g)


_patch_level_contrib.defvjp(_plc_fwd, _plc_bwd)


def ms_deform_attn_xla5(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    onehot_max_hw: int = 1024,
) -> jax.Array:
    """xla4 forward with a PER-LEVEL backward (round-5): small levels keep
    the fused one-hot MXU dots and differentiate NATIVELY (their backward
    is the transposed one-hot dot — MXU routing, no scatters at all); only
    the big levels fall back to the plain per-corner backward.  The
    blanket plain-form backward (_ms_deform_attn_xla4_xlabwd) recomputed
    4 corner takes x 4 levels per layer and scattered at every level —
    the r5a profile charged ~90 ms/enc-layer to that machinery."""
    b, s, n_heads, head_dim = value.shape
    _, lq, _, n_levels, n_points, _ = sampling_locations.shape
    loc = sampling_locations.transpose(0, 2, 1, 3, 4, 5).reshape(
        b * n_heads, lq, n_levels, n_points, 2
    )
    att = attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        b * n_heads, lq, n_levels, n_points
    ).astype(jnp.float32)
    vt = value.transpose(0, 2, 1, 3).reshape(b * n_heads, s, head_dim)

    out = jnp.zeros((b * n_heads, lq, head_dim), jnp.float32)
    start = 0
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        vl = vt[:, start : start + hh * ww]
        if hh * ww > onehot_max_hw and hh >= 2 and ww >= 2:
            out += _patch_level_contrib(
                hh, ww, vl.reshape(-1, hh, ww, head_dim),
                loc[:, :, lvl], att[:, :, lvl],
            )
        else:
            gxy = jnp.stack(
                [
                    loc[:, :, lvl, :, 0].astype(jnp.float32) * ww - 0.5,
                    loc[:, :, lvl, :, 1].astype(jnp.float32) * hh - 0.5,
                ],
                axis=-1,
            )
            gx = gxy[..., 0]
            gy = gxy[..., 1]
            x0 = jnp.floor(gx)
            y0 = jnp.floor(gy)
            fx = (gx - x0)[..., None]
            fy = (gy - y0)[..., None]
            x0i = x0.astype(jnp.int32)[..., None]
            y0i = y0.astype(jnp.int32)[..., None]
            dxy = jnp.array([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.int32)
            xi = x0i + dxy[None, None, None, :, 1]
            yi = y0i + dxy[None, None, None, :, 0]
            valid = (xi >= 0) & (xi < ww) & (yi >= 0) & (yi < hh)
            cw = jnp.where(
                dxy[None, None, None, :, 1] == 0, 1.0 - fx, fx
            ) * jnp.where(dxy[None, None, None, :, 0] == 0, 1.0 - fy, fy)
            wgt = jnp.where(valid, cw, 0.0) * att[:, :, lvl][..., None]
            idx = jnp.clip(yi, 0, hh - 1) * ww + jnp.clip(xi, 0, ww - 1)
            nc = n_points * 4
            gl = _gather_onehot(
                vl, idx.reshape(b * n_heads, lq * nc)
            ).reshape(b * n_heads, lq, nc, head_dim)
            out += jnp.einsum(
                "blnd,bln->bld",
                gl,
                wgt.reshape(b * n_heads, lq, nc).astype(gl.dtype),
                preferred_element_type=jnp.float32,
            )
        start += hh * ww
    out = out.astype(value.dtype)
    out = out.reshape(b, n_heads, lq, head_dim).transpose(0, 2, 1, 3)
    return out.reshape(b, lq, n_heads * head_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ms_deform_attn_xla4_xlabwd(spatial_shapes, value, loc, att):
    """xla4 forward with the plain-gather formulation's backward.

    Same math in both forms (tests/test_msdeform.py asserts xla4 == xla
    to bf16 tolerance incl. grads), so recomputing the vjp through
    :func:`ms_deform_attn_xla` is exact; what changes is the HLO: the
    backward becomes per-element scatter-adds (which the relay toolchain
    compiles) instead of 2x2-patch slice scatters (which kill it)."""
    return ms_deform_attn_xla4(value, spatial_shapes, loc, att)


def _xla4_xlabwd_fwd(spatial_shapes, value, loc, att):
    return ms_deform_attn_xla4(value, spatial_shapes, loc, att), (
        value, loc, att,
    )


def _xla4_xlabwd_bwd(spatial_shapes, res, g):
    value, loc, att = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_xla(v, spatial_shapes, l, a),
        value, loc, att,
    )
    return vjp(g)


_ms_deform_attn_xla4_xlabwd.defvjp(_xla4_xlabwd_fwd, _xla4_xlabwd_bwd)


def _offset_bias_init(num_heads, num_levels, num_points):
    """Directional point-spread bias (reference init_weights,
    multi_scale_deform_attn.py:202-218)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (heads, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


class MSDeformAttention(nn.Module):
    """Flax module matching detrex MultiScaleDeformableAttention
    (multi_scale_deform_attn.py:140-428), batch-first."""

    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Lq, C)
        value: jax.Array,  # (B, sum(HW), C)
        reference_points: jax.Array,  # (B, Lq, levels, 2 or 4) in [0,1]
        spatial_shapes: Sequence[Tuple[int, int]],
        identity: Optional[jax.Array] = None,
        query_pos: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,  # (B, sum(HW)) True=pad
        deterministic: bool = True,
    ) -> jax.Array:
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos

        b, lq, _ = query.shape
        n_value = value.shape[1]
        head_dim = self.embed_dim // self.num_heads

        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="value_proj")(value)
        if key_padding_mask is not None:
            v = jnp.where(key_padding_mask[..., None], 0.0, v)
        v = v.reshape(b, n_value, self.num_heads, head_dim)

        offsets = nn.Dense(
            self.num_heads * self.num_levels * self.num_points * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _offset_bias_init(self.num_heads, self.num_levels, self.num_points),
                dtype,
            ),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(b, lq, self.num_heads, self.num_levels, self.num_points, 2)

        weights = nn.Dense(
            self.num_heads * self.num_levels * self.num_points,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(
            b, lq, self.num_heads, self.num_levels * self.num_points
        )
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1).astype(
            query.dtype
        )
        weights = weights.reshape(
            b, lq, self.num_heads, self.num_levels, self.num_points
        )

        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[wd, ht] for (ht, wd) in spatial_shapes], jnp.float32
            )  # (levels, 2) as (w, h)
            locations = (
                reference_points[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            locations = (
                reference_points[:, :, None, :, None, :2]
                + offsets
                / self.num_points
                * reference_points[:, :, None, :, None, 2:]
                * 0.5
            )
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        out = ms_deform_attn(v, spatial_shapes, locations, weights)
        # named checkpoint point: under the remat-scanned enc/dec stacks
        # (transformer.py) the save_only_these_names policy keeps THIS
        # tensor ((B, Lq, C) f32, ~20 MB/enc layer at 800x1216) so the
        # backward skips re-running the sampling gathers — the largest
        # single slice of the encoder backward scan
        # (dev/logs/r5a_profile.log: while.209).
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, "msdeform_out")
        out = nn.Dense(self.embed_dim, dtype=self.dtype, name="output_proj")(out)
        if self.dropout > 0.0 and not deterministic:
            out = nn.Dropout(self.dropout)(out, deterministic=False)
        return identity + out
