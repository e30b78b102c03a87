"""DensePose chart-based head + predictor + losses (compact).

Reference: detectron2/projects/DensePose/densepose/modeling/
roi_heads/v1convx.py (DensePoseV1ConvXHead :15-66: N stacked 3x3 convs,
hidden 512), predictors/chart.py (DensePoseChartPredictor :15-110: four
stride-2 deconvs -> coarse segm (2 or 15 ch), fine segm I / U / V
(NUM_PATCHES+1 = 25 ch each) + 2x bilinear upscale) and losses/chart.py
(DensePoseChartLoss: CE on coarse+fine segmentation at annotated points,
smooth-L1 on U/V at points labeled with a body part).

TPU-native notes: per-instance point supervision is fully vectorized —
point values are gathered bilinearly from the predicted charts (static P
points per instance, invalid points masked), so the whole loss jits.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class DensePoseChartHead(nn.Module):
    """v1convx head + chart predictor.  Input: (R, H, W, C) per-instance ROI
    features; output dict of NHWC charts at 2x the input resolution."""

    hidden_dim: int = 512
    num_stacked_convs: int = 8
    num_coarse_segm: int = 2
    num_patches: int = 24
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        for i in range(self.num_stacked_convs):
            x = nn.Conv(
                self.hidden_dim, (3, 3), padding=1,
                dtype=self.dtype, name=f"body_conv_fcn{i + 1}",
            )(x)
            x = nn.relu(x)
        c = self.num_patches + 1

        def deconv(feat, ch, name):
            # SAME padding gives out = 2*in, the torch
            # ConvTranspose2d(k=4, s=2, p=1) output size
            y = nn.ConvTranspose(
                ch, (4, 4), strides=(2, 2), padding="SAME",
                dtype=self.dtype, name=name,
            )(feat)
            return y

        return {
            "coarse_segm": deconv(x, self.num_coarse_segm, "ann_index_lowres"),
            "fine_segm": deconv(x, c, "index_uv_lowres"),
            "u": deconv(x, c, "u_lowres"),
            "v": deconv(x, c, "v_lowres"),
        }


def _bilinear_at_points(chart: jax.Array, pts: jax.Array) -> jax.Array:
    """Sample (R, H, W, C) charts at (R, P, 2) normalized (x, y) in [0,1]^2.
    Returns (R, P, C)."""
    r, h, w, c = chart.shape
    x = pts[..., 0] * (w - 1)
    y = pts[..., 1] * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    bidx = jnp.arange(r)[:, None]
    v00 = chart[bidx, y0, x0]
    v01 = chart[bidx, y0, x1]
    v10 = chart[bidx, y1, x0]
    v11 = chart[bidx, y1, x1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def densepose_losses(
    outputs: Dict[str, jax.Array],
    point_coords: jax.Array,
    part_labels: jax.Array,
    u_targets: jax.Array,
    v_targets: jax.Array,
    coarse_targets: jax.Array,
    valid: jax.Array,
    *,
    w_segm: float = 2.0,
    w_part: float = 0.3,
    w_points: float = 0.1,
) -> Dict[str, jax.Array]:
    """DensePoseChartLoss (losses/chart.py) on static point sets.

    point_coords (R,P,2) in [0,1]^2; part_labels (R,P) in [0..24] (0 = bg);
    u/v_targets (R,P); coarse_targets (R,Hc,Wc) fg/bg int; valid (R,P) bool.
    """
    fine = _bilinear_at_points(
        outputs["fine_segm"].astype(jnp.float32), point_coords
    )
    uu = _bilinear_at_points(outputs["u"].astype(jnp.float32), point_coords)
    vv = _bilinear_at_points(outputs["v"].astype(jnp.float32), point_coords)

    vmask = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(vmask), 1.0)
    # fine segmentation CE at points
    logp = jax.nn.log_softmax(fine, axis=-1)
    ce = -jnp.take_along_axis(logp, part_labels[..., None], axis=-1)[..., 0]
    loss_part = jnp.sum(ce * vmask) / n

    # U/V smooth-L1 at points with a body-part label (> 0), on the channel
    # of the GT part
    has_part = vmask * (part_labels > 0)
    npts = jnp.maximum(jnp.sum(has_part), 1.0)
    up = jnp.take_along_axis(uu, part_labels[..., None], axis=-1)[..., 0]
    vp = jnp.take_along_axis(vv, part_labels[..., None], axis=-1)[..., 0]

    def smooth_l1(p, t):
        d = jnp.abs(p - t)
        return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)

    loss_u = jnp.sum(smooth_l1(up, u_targets) * has_part) / npts
    loss_v = jnp.sum(smooth_l1(vp, v_targets) * has_part) / npts

    # coarse segmentation CE over the full chart
    cs = outputs["coarse_segm"].astype(jnp.float32)
    logp = jax.nn.log_softmax(cs, axis=-1)
    ce = -jnp.take_along_axis(
        logp, coarse_targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    loss_segm = jnp.mean(ce)

    return {
        "loss_densepose_I": w_part * loss_part,
        "loss_densepose_U": w_points * loss_u,
        "loss_densepose_V": w_points * loss_v,
        "loss_densepose_S": w_segm * loss_segm,
    }
