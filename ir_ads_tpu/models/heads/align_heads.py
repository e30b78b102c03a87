"""Alignment-based decode heads: SFNet (flow-aligned FPN), FaPN (deformable
feature alignment), Lawin (large-window attention ASPP).

References: semseg/models/heads/{sfnet.py,fapn.py,lawin.py}.  Flow warps and
deformable alignment ride the shared grid_sample / deform_conv primitives;
Lawin's unfold windows come from lax.conv_general_dilated_patches.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.detection.deform_conv import deform_conv2d
from ir_ads_tpu.models.heads.extra_heads import PPM, ConvModule
from ir_ads_tpu.ops.grid_sample import grid_sample
from ir_ads_tpu.ops.layers import resize_bilinear

Dtype = Any


def flow_warp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """Warp x (B, H, W, C) by a pixel-offset flow field (B, H, W, 2) as
    (dx, dy) normalized by (W, H) (reference AlignedModule.flow_warp)."""
    b, h, w, _ = flow.shape
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    base = jnp.stack([gx, gy], -1)[None]
    norm = jnp.asarray([w, h], jnp.float32)
    grid = base + flow / norm
    return grid_sample(x, grid, align_corners=False)


class AlignedModule(nn.Module):
    """SFNet flow alignment (sfnet.py:8-33)."""

    channel: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, low: jax.Array, high: jax.Array) -> jax.Array:
        high_origin = high
        size = low.shape[1:3]
        low_p = nn.Conv(self.channel, (1, 1), use_bias=False,
                        dtype=self.dtype, name="down_l")(low)
        high_p = nn.Conv(self.channel, (1, 1), use_bias=False,
                         dtype=self.dtype, name="down_h")(high)
        high_p = resize_bilinear(high_p, size, align_corners=True)
        flow = nn.Conv(2, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                       name="flow_make")(
            jnp.concatenate([high_p, low_p], -1)
        )
        high_up = resize_bilinear(high_origin, size, align_corners=True)
        # reference warps the *original-resolution* high feature with the
        # low-res grid; warping the upsampled map at target size is the
        # equivalent static-shape formulation
        return flow_warp(high_up, flow.astype(jnp.float32))


class SFHead(nn.Module):
    """SFNet head (sfnet.py:36-71)."""

    channel: int = 256
    num_classes: int = 19
    drop: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        f = PPM(self.channel, dtype=self.dtype, name="ppm")(features[-1], train)
        fpn = [f]
        for i in reversed(range(len(features) - 1)):
            lateral = ConvModule(self.channel, 1, dtype=self.dtype,
                                 name=f"fpn_in_{i}")(features[i], train)
            aligned = AlignedModule(self.channel // 2, dtype=self.dtype,
                                    name=f"align_{i}")(lateral, f)
            f = lateral + aligned
            fpn.append(ConvModule(self.channel, 3, dtype=self.dtype,
                                  name=f"fpn_out_{i}")(f, train))
        fpn.reverse()
        size = fpn[0].shape[1:3]
        fpn = [fpn[0]] + [
            resize_bilinear(p, size, align_corners=True) for p in fpn[1:]
        ]
        out = ConvModule(self.channel, 3, dtype=self.dtype, name="bottleneck")(
            jnp.concatenate(fpn, -1), train
        )
        if train and self.drop > 0:
            out = nn.Dropout(self.drop)(out, deterministic=False)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(out)


class FAM(nn.Module):
    """FaPN feature alignment (fapn.py:28-56): FSM lateral + DCNv2-aligned
    upsample."""

    channel: int
    groups: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feat_l: jax.Array, feat_s: jax.Array,
                 train: bool = False) -> jax.Array:
        # FSM
        atten = nn.Conv(feat_l.shape[-1], (1, 1), use_bias=False,
                        dtype=self.dtype, name="fsm_atten")(
            feat_l.mean((1, 2), keepdims=True)
        )
        feat_arm = feat_l + feat_l * jax.nn.sigmoid(atten)
        feat_arm = nn.Conv(self.channel, (1, 1), use_bias=False,
                           dtype=self.dtype, name="fsm_conv")(feat_arm)

        feat_up = resize_bilinear(feat_s, feat_l.shape[1:3],
                                  align_corners=False)
        guide = nn.Conv(self.channel, (1, 1), use_bias=False,
                        dtype=self.dtype, name="offset_conv")(
            jnp.concatenate([feat_arm, feat_up * 2], -1)
        )
        # offset/mask head initialized to zero (reference _init_offset)
        om = nn.Conv(3 * 9, (3, 3), padding=1,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="offset_mask")(guide)
        o1, o2, mask = jnp.split(om, 3, axis=-1)
        offsets = jnp.concatenate(
            [o1[..., :, None], o2[..., :, None]], -1
        ).reshape(*o1.shape[:-1], 18)
        mask = jax.nn.sigmoid(mask)
        w = self.param(
            "dcn_kernel", nn.initializers.he_normal(),
            (3, 3, self.channel, self.channel),
        )
        aligned = deform_conv2d(feat_up, w.astype(feat_up.dtype), offsets, mask)
        return nn.relu(aligned) + feat_arm


class FaPNHead(nn.Module):
    """FaPN head (fapn.py:59-81)."""

    channel: int = 128
    num_classes: int = 19
    drop: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        feats = features[::-1]
        out = ConvModule(self.channel, 1, dtype=self.dtype, name="align_0")(
            feats[0], train
        )
        for i, f in enumerate(feats[1:]):
            out = FAM(self.channel, dtype=self.dtype, name=f"fam_{i}")(
                f, out, train
            )
            out = ConvModule(self.channel, 3, dtype=self.dtype,
                             name=f"output_{i}")(out, train)
        if train and self.drop > 0:
            out = nn.Dropout(self.drop)(out, deterministic=False)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(out)


def _unfold(x: jax.Array, kernel: int, stride: int, pad: int) -> jax.Array:
    """torch F.unfold on NHWC: -> (B, nh, nw, kernel*kernel*C) with torch's
    channel-major tap order (c * k*k + tap)."""
    patches = jax.lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2),  # NCHW for channel-major ordering
        (kernel, kernel), (stride, stride), [(pad, pad), (pad, pad)],
    )  # (B, C*k*k, nh, nw)
    return patches.transpose(0, 2, 3, 1)


class LawinAttn(nn.Module):
    """Large-window non-local attention (lawin.py:53-104)."""

    channels: int
    head: int = 4
    patch_sq: int = 64  # context token count after pooling (= patch_size^2)
    reduction: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, query: jax.Array, context: jax.Array,
                 train: bool = False) -> jax.Array:
        # query/context: (N, ph, pw, C) window batches
        n, qh, qw, c = query.shape
        ch_per_head = c // self.head
        inter = max(c // self.reduction, 1)

        ctx = context.reshape(n, -1, c)
        # position mixing per head over token dim
        mixed = []
        ntok = ctx.shape[1]
        for i in range(self.head):
            part = ctx[..., i * ch_per_head : (i + 1) * ch_per_head]
            # linear mix over the token axis (reference position_mixing)
            pm = nn.Dense(
                ntok, dtype=self.dtype, name=f"position_mixing_{i}"
            )(part.transpose(0, 2, 1)).transpose(0, 2, 1)
            mixed.append(pm)
        ctx = ctx + jnp.concatenate(mixed, axis=-1)

        g = nn.Dense(inter, dtype=self.dtype, name="g")(ctx)
        phi = nn.Dense(inter, dtype=self.dtype, name="phi")(ctx)
        theta = nn.Dense(inter, dtype=self.dtype, name="theta")(
            query.reshape(n, -1, c)
        )
        hd = inter // self.head

        def heads(t):
            return t.reshape(n, -1, self.head, hd).transpose(0, 2, 1, 3)

        th, ph_, gh = heads(theta), heads(phi), heads(g)
        attn = jnp.einsum("nhqd,nhkd->nhqk", th, ph_,
                          preferred_element_type=jnp.float32) / (hd**0.5)
        attn = jax.nn.softmax(attn, -1)
        y = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(gh.dtype), gh,
                       preferred_element_type=jnp.float32).astype(query.dtype)
        y = y.transpose(0, 2, 1, 3).reshape(n, qh, qw, inter)
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_out")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="out_bn")(y)
        return query + y


class LawinHead(nn.Module):
    """Lawin head (lawin.py:119-183): MLP fuse + multi-ratio large-window
    attention pyramid + low-level fusion."""

    embed_dim: int = 512
    num_classes: int = 19
    patch: int = 8
    drop: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        b = features[0].shape[0]
        h, w = features[1].shape[1:3]
        outs = [
            nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_c2")(
                features[1]
            )
        ]
        for i, feat in enumerate(features[2:]):
            cf = nn.Dense(self.embed_dim, dtype=self.dtype,
                          name=f"linear_c{i + 3}")(feat)
            outs.append(resize_bilinear(cf, (h, w), align_corners=False))
        feat = ConvModule(self.embed_dim, 1, dtype=self.dtype,
                          name="linear_fuse")(
            jnp.concatenate(outs[::-1], -1), train
        )

        p = self.patch
        short = ConvModule(self.embed_dim, 1, dtype=self.dtype,
                           name="short_path")(feat, train)
        pool = ConvModule(self.embed_dim, 1, dtype=self.dtype,
                          name="image_pool")(
            feat.mean((1, 2), keepdims=True), train
        )
        pool = jnp.broadcast_to(pool, short.shape)

        # query windows (non-overlapping p x p)
        nh, nw = h // p, w // p
        query = feat[:, : nh * p, : nw * p].reshape(b, nh, p, nw, p, -1)
        query = query.transpose(0, 1, 3, 2, 4, 5).reshape(-1, p, p, self.embed_dim)

        lawin_outs = []
        for r in (8, 4, 2):
            pad = int((r - 1) / 2 * p)
            ctxp = _unfold(feat, p * r, p, pad)  # (B, nh, nw, C*(pr)^2)
            ctxp = ctxp.reshape(b * nh * nw, self.embed_dim, r * p, r * p)
            ctxp = ctxp.transpose(0, 2, 3, 1)  # (N, rp, rp, C)
            # pooled patch embed (max+avg) / 2 down to (p, p)
            ctx = 0.5 * (
                nn.max_pool(ctxp, (r, r), strides=(r, r))
                + nn.avg_pool(ctxp, (r, r), strides=(r, r))
            )
            ctx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name=f"ds_norm_{r}")(ctx)
            out = LawinAttn(
                self.embed_dim, patch_sq=p * p, dtype=self.dtype,
                name=f"lawin_{r}",
            )(query, ctx, train)
            out = out.reshape(b, nh, nw, p, p, -1).transpose(0, 1, 3, 2, 4, 5)
            lawin_outs.append(out.reshape(b, nh * p, nw * p, -1))

        cat = jnp.concatenate([short, pool] + lawin_outs, -1)
        output = ConvModule(self.embed_dim, 1, dtype=self.dtype, name="cat")(
            cat, train
        )

        c1 = nn.Dense(48, dtype=self.dtype, name="linear_c1")(features[0])
        output = resize_bilinear(output, features[0].shape[1:3],
                                 align_corners=False)
        fused = ConvModule(self.embed_dim, 1, dtype=self.dtype,
                           name="low_level_fuse")(
            jnp.concatenate([output, c1], -1), train
        )
        if train and self.drop > 0:
            fused = nn.Dropout(self.drop)(fused, deterministic=False)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="linear_pred")(fused)
