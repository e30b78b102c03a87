"""Deformable convolution v1/v2/v3 on TPU.

Reference native kernels being replaced (SURVEY.md §2.6):
  * detectron2 csrc/deformable/deform_conv_cuda.cu (DCNv1 + modulated DCNv2)
  * detrex csrc/DCNv3 (InternImage backbone)

Design: deformable conv = bilinear sampling at per-output-location offsets
(the shared grid_sample primitive) followed by one big matmul over the
k*k*C_in gathered patch — an im2col the MXU eats directly.  Differentiable
by construction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ir_ads_tpu.ops.grid_sample import grid_sample


def deform_conv2d(
    x: jax.Array,  # (B, H, W, Cin)
    weight: jax.Array,  # (kh, kw, Cin, Cout)
    offsets: jax.Array,  # (B, Ho, Wo, kh*kw*2) as (dy, dx) per tap
    mask: Optional[jax.Array] = None,  # (B, Ho, Wo, kh*kw) modulation (DCNv2)
    stride: int = 1,
    padding: Optional[int] = None,
) -> jax.Array:
    """Deformable conv; padding defaults to 'same' taps (k//2)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    pad = kh // 2 if padding is None else padding
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (w + 2 * pad - kw) // stride + 1
    k = kh * kw

    # base sampling positions per tap (input coords)
    oy = jnp.arange(ho) * stride - pad
    ox = jnp.arange(wo) * stride - pad
    ty, tx = jnp.meshgrid(
        jnp.arange(kh, dtype=jnp.float32),
        jnp.arange(kw, dtype=jnp.float32),
        indexing="ij",
    )
    base_y = oy[:, None, None].astype(jnp.float32) + ty.reshape(-1)[None, None]
    base_x = ox[None, :, None].astype(jnp.float32) + tx.reshape(-1)[None, None]
    base_y = jnp.broadcast_to(base_y, (ho, wo, k))
    base_x = jnp.broadcast_to(base_x, (ho, wo, k))

    off = offsets.reshape(b, ho, wo, k, 2)
    sy = base_y[None] + off[..., 0]
    sx = base_x[None] + off[..., 1]

    # normalize to [-1, 1] (align_corners=True pixel centers)
    ny = sy / jnp.maximum(h - 1, 1) * 2 - 1
    nx = sx / jnp.maximum(w - 1, 1) * 2 - 1
    grid = jnp.stack([nx, ny], axis=-1).reshape(b, ho * wo, k, 2)

    sampled = grid_sample(x, grid, align_corners=True, padding_zero=True)
    sampled = sampled.reshape(b, ho, wo, k, cin)
    if mask is not None:
        sampled = sampled * mask[..., None]
    patches = sampled.reshape(b, ho, wo, k * cin)
    wmat = weight.reshape(k * cin, cout)
    return jnp.einsum(
        "bhwp,pc->bhwc", patches, wmat, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def dcn_v3_core(
    x: jax.Array,  # (B, H, W, C)
    offsets: jax.Array,  # (B, H, W, groups*k*2)
    mask: jax.Array,  # (B, H, W, groups*k) softmaxed over k
    kernel: int = 3,
    groups: int = 4,
) -> jax.Array:
    """DCNv3 sampling core (detrex csrc/DCNv3): grouped deformable
    aggregation without the conv weight (InternImage applies separate
    input/output projections)."""
    b, h, w, c = x.shape
    gc = c // groups
    k = kernel * kernel
    pad = kernel // 2

    ty, tx = jnp.meshgrid(
        jnp.arange(kernel, dtype=jnp.float32) - pad,
        jnp.arange(kernel, dtype=jnp.float32) - pad,
        indexing="ij",
    )
    base_y = jnp.arange(h, dtype=jnp.float32)[:, None, None] + ty.reshape(-1)
    base_x = jnp.arange(w, dtype=jnp.float32)[None, :, None] + tx.reshape(-1)
    base_y = jnp.broadcast_to(base_y, (h, w, k))
    base_x = jnp.broadcast_to(base_x, (h, w, k))

    off = offsets.reshape(b, h, w, groups, k, 2)
    sy = base_y[None, :, :, None] + off[..., 0]
    sx = base_x[None, :, :, None] + off[..., 1]
    ny = sy / jnp.maximum(h - 1, 1) * 2 - 1
    nx = sx / jnp.maximum(w - 1, 1) * 2 - 1

    xg = x.reshape(b, h, w, groups, gc).transpose(0, 3, 1, 2, 4)
    xg = xg.reshape(b * groups, h, w, gc)
    grid = jnp.stack([nx, ny], -1).transpose(0, 3, 1, 2, 4, 5)
    grid = grid.reshape(b * groups, h * w, k, 2)
    sampled = grid_sample(xg, grid, align_corners=True)  # (B*g, HW, k, gc)

    m = mask.reshape(b, h, w, groups, k).transpose(0, 3, 1, 2, 4)
    m = m.reshape(b * groups, h * w, k)
    out = jnp.einsum(
        "nqkc,nqk->nqc", sampled.astype(jnp.float32), m.astype(jnp.float32)
    )
    out = out.reshape(b, groups, h, w, gc).transpose(0, 2, 3, 1, 4)
    return out.reshape(b, h, w, c).astype(x.dtype)
