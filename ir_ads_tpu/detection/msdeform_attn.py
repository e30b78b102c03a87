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

    Dispatch (IR_ADS_MSDEFORM env, read at trace time): 'pallas' runs the
    round-4 dynamic-gather kernel (ops/pallas_msdeform.py), 'xla' the
    gather formulation below.  'auto' (default) resolves to XLA even on
    TPU: the current relay toolchain cannot lower ANY in-kernel dynamic
    gather (minimal take_along_axis repros kill the compile helper —
    dev/probe_dyngather.py, COVERAGE.md round-4), so the Pallas kernel is
    opt-in for toolchains where tpu.dynamic_gather works.
    """
    import os

    impl = os.environ.get("IR_ADS_MSDEFORM", "auto")
    if impl == "auto":
        impl = "xla"
    if impl == "pallas":
        from ir_ads_tpu.ops.pallas_msdeform import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, tuple(map(tuple, spatial_shapes)),
            sampling_locations, attention_weights,
        )
    return ms_deform_attn_xla(
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
        out = nn.Dense(self.embed_dim, dtype=self.dtype, name="output_proj")(out)
        if self.dropout > 0.0 and not deterministic:
            out = nn.Dropout(self.dropout)(out, deterministic=False)
        return identity + out
