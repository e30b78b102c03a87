"""Bilinear grid sampling — the deformable-attention primitive.

One primitive serves both of the reference's native sampling paths:
  * DAttentionMM's six F.grid_sample calls (semseg/models/backbones/swin.py:911-1007)
  * MSDeformAttn's CUDA im2col kernel (detrex/layers/csrc/MsDeformAttn/)

Implemented as XLA gathers; differentiable (JAX autodiff through gather /
scatter-add gives the same gradients as the reference's hand-written CUDA
backward).  Shapes are static, so everything fuses under jit.

Layout is NHWC (TPU-native) — channels last keeps the gathered vectors
contiguous on the lane dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    align_corners: bool = True,
    padding_zero: bool = True,
) -> jax.Array:
    """Bilinear sample ``img`` at normalized locations ``grid``.

    Matches torch.nn.functional.grid_sample(mode='bilinear',
    padding_mode='zeros') semantics.

    Args:
      img: (B, H, W, C) input feature map.
      grid: (B, Hg, Wg, 2) sampling locations in [-1, 1], last dim = (x, y)
        (torch convention: grid[..., 0] indexes width).
      align_corners: if True, -1/+1 refer to the centers of the corner
        pixels; else to the corners of the image.
      padding_zero: zero contribution from out-of-bounds corners.

    Returns:
      (B, Hg, Wg, C) sampled values, in ``img.dtype``.
    """
    b, h, w, c = img.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        flat = (yc * w + xc).reshape(b, -1)  # (B, Hg*Wg)
        vals = jnp.take_along_axis(
            img.reshape(b, h * w, c), flat[..., None], axis=1
        ).reshape(*xi.shape, c)
        if padding_zero:
            wgt = jnp.where(valid, wgt, 0.0)
        return vals.astype(jnp.float32) * wgt[..., None]

    out = (
        corner(x0i, y0i, (1 - fx) * (1 - fy))
        + corner(x0i + 1, y0i, fx * (1 - fy))
        + corner(x0i, y0i + 1, (1 - fx) * fy)
        + corner(x0i + 1, y0i + 1, fx * fy)
    )
    return out.astype(img.dtype)


def grid_sample_matmul(
    img: jax.Array,
    grid: jax.Array,
    align_corners: bool = True,
) -> jax.Array:
    """Exact bilinear sampling as two separable hat-weight contractions.

    Bilinear interpolation factorizes per axis: the 4-corner weight of tap
    (X, Y) for a sample at (ix, iy) is hat(ix-X)*hat(iy-Y) with
    hat(t)=max(0, 1-|t|), and torch's zeros-padding drops out-of-bounds
    corners — which the hat weights do per axis automatically (weight 0
    outside [0, size-1], partial weight in the half-open border cell).  So

        out[p, c] = sum_Y hat(iy_p-Y) * sum_X hat(ix_p-X) * img[Y, X, c]

    is EXACTLY ``grid_sample(img, grid, padding_mode='zeros')`` but runs as
    two small matmuls on the MXU instead of 4 gathers on the scalar path.
    On v5e the DAttentionMM sampling shapes (300 points from 120x160x16)
    drop ~30x: 1.49 ms -> matmul noise floor (dev/profile_components.py).

    Only profitable when the number of sample points is small and shared
    across outputs (deformable cross-modal fusion); for per-query sampling
    (MSDeformAttn, DCNv3) the (points, W) weight matrices would dwarf the
    gathers — keep ``grid_sample`` there.

    Args / returns: same convention as ``grid_sample`` (grid last dim is
    (x, y) in [-1, 1]); returns (B, Hg, Wg, C) in ``img.dtype``.
    """
    b, h, w, c = img.shape
    _, hg_out, wg_out, _ = grid.shape
    gx = grid[..., 0].astype(jnp.float32).reshape(b, -1)  # (B, n)
    gy = grid[..., 1].astype(jnp.float32).reshape(b, -1)

    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(ix[..., None] - jnp.arange(w, dtype=jnp.float32))
    )  # (B, n, W)
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(iy[..., None] - jnp.arange(h, dtype=jnp.float32))
    )  # (B, n, H)

    # In reduced-precision models run the MXU with matching operand dtype:
    # mixed f32-weight x bf16-feature einsums promote to the (much slower)
    # f32 MXU path, and the f32->bf16 hat-weight rounding is below the
    # model's own bf16 noise.  f32 models keep exact f32 weights.
    wdt = img.dtype if jnp.dtype(img.dtype) == jnp.bfloat16 else jnp.float32
    t = jnp.einsum(
        "bnw,bhwc->bnhc",
        wx.astype(wdt),
        img,
        preferred_element_type=jnp.float32,
    ).astype(wdt)
    out = jnp.einsum(
        "bnh,bnhc->bnc",
        wy.astype(wdt),
        t,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, hg_out, wg_out, c).astype(img.dtype)


def make_ref_grid(h: int, w: int, batch: int, centered: bool = True) -> jax.Array:
    """Reference grid of normalized (y, x) coordinates, (B, H, W, 2).

    ``centered=True`` matches DAttentionMM._get_ref_points (swin.py:842-854):
    linspace(0.5, n-0.5) normalized by (n-1) into roughly [-1, 1].
    ``centered=False`` matches _get_q_grid (arange 0..n-1).
    """
    # guard the degenerate 1-wide grid (reference divides by zero there)
    hd = float(max(h - 1, 1))
    wd = float(max(w - 1, 1))
    if centered:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / hd * 2.0 - 1.0
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / wd * 2.0 - 1.0
    else:
        ys = jnp.arange(h, dtype=jnp.float32) / hd * 2.0 - 1.0
        xs = jnp.arange(w, dtype=jnp.float32) / wd * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ref = jnp.stack([gy, gx], axis=-1)  # (H, W, 2) as (y, x)
    return jnp.broadcast_to(ref[None], (batch, h, w, 2))
