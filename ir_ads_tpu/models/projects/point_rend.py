"""PointRend project: point head, coarse mask head, adaptive subdivision.

TPU-native rebuild of detectron2/projects/PointRend/point_rend/:
  * StandardPointHead       (point_head.py:80-130)
  * ConvFCHead coarse head  (mask_head.py:52-145)
  * calculate_uncertainty   (mask_head.py:29-49)
  * point_sample / get_uncertain_point_coords_{on_grid,with_randomness}
                            (point_features.py:19-160)
  * PointRendMaskHead forward + _subdivision_inference
                            (mask_head.py:168-361)

Static-shape redesign: the reference scatters point predictions into an
upsampled mask with dynamic instance lists; here every step works on a fixed
R x P block and the scatter is `.at[idx].set` over flattened grids.  The
subdivision loop itself is a python loop over `subdivision_steps` (static,
unrolled under jit) exactly mirroring mask_head.py:302-361.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.ops.grid_sample import grid_sample

Dtype = Any


def point_sample(feats: jax.Array, coords: jax.Array) -> jax.Array:
    """d2 point_sample (point_features.py:19-41): bilinear sample at
    normalized [0, 1] coords, align_corners=False.

    feats: (N, H, W, C); coords: (N, P, 2) as (x, y) -> (N, P, C)."""
    grid = coords[:, :, None, :] * 2.0 - 1.0
    out = grid_sample(feats, grid, align_corners=False)
    return out[:, :, 0, :]


def calculate_uncertainty(logits: jax.Array, classes: jax.Array) -> jax.Array:
    """-|logit of the ground-truth/predicted class| (mask_head.py:29-49).

    logits: (N, P, C) or (N, P, 1); classes: (N,) -> (N, P)."""
    if logits.shape[-1] == 1:
        sel = logits[..., 0]
    else:
        sel = jnp.take_along_axis(
            logits, classes[:, None, None], axis=-1
        )[..., 0]
    return -jnp.abs(sel)


def get_uncertain_point_coords_on_grid(
    uncertainty: jax.Array, num_points: int
) -> Tuple[jax.Array, jax.Array]:
    """Top-N most uncertain grid cells (point_features.py:119-145).

    uncertainty: (N, H, W) -> (indices (N, P) into H*W, coords (N, P, 2))."""
    n, h, w = uncertainty.shape
    num_points = min(num_points, h * w)
    flat = uncertainty.reshape(n, h * w)
    idx = jax.lax.top_k(flat, num_points)[1]
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    coords = jnp.stack(
        [(x + 0.5) / w, (y + 0.5) / h], axis=-1
    )
    return idx, coords


def get_uncertain_point_coords_with_randomness(
    logits: jax.Array,  # (N, H, W, C) coarse logits
    classes: jax.Array,  # (N,)
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
    key: jax.Array,
) -> jax.Array:
    """Training-time point sampling (point_features.py:63-116)."""
    n = logits.shape[0]
    k1, k2 = jax.random.split(key)
    n_sampled = int(num_points * oversample_ratio)
    coords = jax.random.uniform(k1, (n, n_sampled, 2))
    at = point_sample(logits.astype(jnp.float32), coords)
    unc = calculate_uncertainty(at, classes)
    n_unc = int(importance_sample_ratio * num_points)
    top = jax.lax.top_k(unc, n_unc)[1]
    certain = jnp.take_along_axis(coords, top[..., None], axis=1)
    rand = jax.random.uniform(k2, (n, num_points - n_unc, 2))
    return jnp.concatenate([certain, rand], axis=1)


class StandardPointHead(nn.Module):
    """MLP over per-point features, coarse prediction concatenated to every
    layer input (StandardPointHead, point_head.py:80-130; defaults fc_dim
    256, num_fc 3, coarse_pred_each_layer True)."""

    num_classes: int
    fc_dim: int = 256
    num_fc: int = 3
    coarse_pred_each_layer: bool = True
    cls_agnostic: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, fine: jax.Array, coarse: jax.Array) -> jax.Array:
        """fine: (N, P, Cf); coarse: (N, P, num_classes) ->
        (N, P, num_mask_classes)."""
        kaiming = nn.initializers.variance_scaling(
            2.0, "fan_out", "truncated_normal"
        )
        x = jnp.concatenate([fine, coarse], axis=-1)
        for k in range(self.num_fc):
            x = nn.Dense(
                self.fc_dim, kernel_init=kaiming, dtype=self.dtype,
                name=f"fc{k + 1}",
            )(x)
            x = nn.relu(x)
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse], axis=-1)
        out_c = 1 if self.cls_agnostic else self.num_classes
        return nn.Dense(
            out_c, kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="predictor",
        )(x)


class ConvFCHead(nn.Module):
    """Coarse mask head: channel-reduce 1x1 -> spatial-reduce 2x2/s2 -> FCs
    -> (num_classes, S, S) prediction (ConvFCHead, mask_head.py:52-145;
    defaults conv_dim 256, fc 1024x2, output 7x7)."""

    num_classes: int
    conv_dim: int = 256
    fc_dims: Sequence[int] = (1024, 1024)
    output_side: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (R, S_in, S_in, C) -> (R, output_side, output_side, classes)."""
        kaiming = nn.initializers.variance_scaling(
            2.0, "fan_out", "truncated_normal"
        )
        if x.shape[-1] > self.conv_dim:
            x = nn.relu(nn.Conv(
                self.conv_dim, (1, 1), kernel_init=kaiming,
                dtype=self.dtype, name="reduce_channel_dim_conv",
            )(x))
        x = nn.relu(nn.Conv(
            self.conv_dim, (2, 2), strides=2, padding="VALID",
            kernel_init=kaiming, dtype=self.dtype,
            name="reduce_spatial_dim_conv",
        )(x))
        x = x.reshape(x.shape[0], -1)
        for k, d in enumerate(self.fc_dims):
            x = nn.relu(nn.Dense(
                d, kernel_init=nn.initializers.xavier_uniform(),
                dtype=self.dtype, name=f"fc{k + 1}",
            )(x))
        s = self.output_side
        out = nn.Dense(
            self.num_classes * s * s,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="prediction",
        )(x)
        return out.reshape(-1, s, s, self.num_classes)


def point_coords_wrt_image(boxes: jax.Array, coords: jax.Array) -> jax.Array:
    """ROI-relative [0,1] coords -> image coords (point_features.py:163-180).
    boxes: (R, 4) xyxy; coords: (R, P, 2) (x, y)."""
    x1, y1, x2, y2 = (boxes[:, i : i + 1] for i in range(4))
    x = x1 + coords[..., 0] * (x2 - x1)
    y = y1 + coords[..., 1] * (y2 - y1)
    return jnp.stack([x, y], axis=-1)


def sample_fine_features(
    features: jax.Array,  # (B, Hf, Wf, C) one fine-grained level
    feature_scale: float,  # e.g. 1/4 for p2
    batch_idx: jax.Array,  # (R,) which image each ROI belongs to
    image_coords: jax.Array,  # (R, P, 2) image-space (x, y)
) -> jax.Array:
    """point_sample_fine_grained_features (point_features.py:183-226) for a
    single level: returns (R, P, C)."""
    b, hf, wf, c = features.shape
    per_roi = features[batch_idx]  # (R, Hf, Wf, C)
    norm = jnp.stack(
        [image_coords[..., 0] * feature_scale / wf,
         image_coords[..., 1] * feature_scale / hf], axis=-1,
    )
    return point_sample(per_roi, norm)


class PointRendMaskHead(nn.Module):
    """Coarse ConvFCHead + StandardPointHead with adaptive subdivision
    inference (PointRendMaskHead, mask_head.py:168-361).

    Call ``coarse()`` + ``point_logits()`` for training (the caller samples
    train points with get_uncertain_point_coords_with_randomness and applies
    sigmoid CE at sampled gt labels), and ``subdivision_inference()`` at
    eval."""

    num_classes: int
    fine_channels: int = 256
    coarse_side: int = 7
    subdivision_steps: int = 3
    subdivision_num_points: int = 784
    init_resolution: int = 7
    dtype: Optional[Dtype] = None

    def setup(self):
        self.coarse_head = ConvFCHead(
            self.num_classes, output_side=self.coarse_side, dtype=self.dtype
        )
        self.point_head = StandardPointHead(
            self.num_classes, dtype=self.dtype
        )

    def __call__(
        self, pooled: jax.Array, fine: jax.Array, coords: jax.Array
    ) -> jax.Array:
        """Training forward (and init): coarse mask + point logits."""
        coarse = self.coarse(pooled)
        return self.point_logits(fine, coarse, coords)

    def coarse(self, pooled: jax.Array) -> jax.Array:
        return self.coarse_head(pooled)

    def point_logits(
        self, fine: jax.Array, coarse_mask: jax.Array, coords: jax.Array
    ) -> jax.Array:
        """fine: (R, P, Cf); coarse_mask: (R, S, S, C); coords (R, P, 2)."""
        coarse_at = point_sample(coarse_mask.astype(jnp.float32), coords)
        return self.point_head(fine, coarse_at)

    def subdivision_inference(
        self,
        fine_fn: Callable[[jax.Array], jax.Array],  # (R,P,2) roi coords -> (R,P,Cf)
        coarse_mask: jax.Array,  # (R, S, S, C)
        pred_classes: jax.Array,  # (R,)
    ) -> jax.Array:
        """mask_head.py:302-361: start from a regular init_resolution grid,
        then repeatedly 2x-upsample and re-predict the top-K most uncertain
        cells.  Returns (R, S_out, S_out, C) mask logits."""
        r = coarse_mask.shape[0]
        res = self.init_resolution
        xs = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
        gx, gy = jnp.meshgrid(xs, xs)
        grid0 = jnp.broadcast_to(
            jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)[None],
            (r, res * res, 2),
        )
        logits_pts = self.point_logits(fine_fn(grid0), coarse_mask, grid0)
        c = logits_pts.shape[-1]
        mask = logits_pts.reshape(r, res, res, c)
        for _ in range(self.subdivision_steps):
            h, w = mask.shape[1] * 2, mask.shape[2] * 2
            mask = jax.image.resize(
                mask.astype(jnp.float32), (r, h, w, c), method="bilinear"
            )
            unc = calculate_uncertainty(
                mask.reshape(r, h * w, c), pred_classes
            ).reshape(r, h, w)
            idx, coords = get_uncertain_point_coords_on_grid(
                unc, self.subdivision_num_points
            )
            pts = self.point_logits(fine_fn(coords), coarse_mask, coords)
            flat = mask.reshape(r, h * w, c)
            flat = jax.vmap(lambda m, i, p: m.at[i].set(p))(flat, idx, pts)
            mask = flat.reshape(r, h, w, c)
        return mask
