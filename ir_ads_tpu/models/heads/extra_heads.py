"""Additional decode heads (reference semseg/models/heads/): UPerHead,
LightHamHead (NMF hamburger), FPNHead, FCNHead, CondHead.

All NHWC flax modules with the same (features list) -> logits interface as
SegFormerHead; the training driver upsamples to input resolution.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.ops.layers import resize_bilinear

Dtype = Any


class ConvModule(nn.Module):
    """Conv + BN (or GN) + ReLU (mmcv ConvModule semantics)."""

    features: int
    kernel: int = 1
    norm: str = "bn"  # "bn" | "gn" | "none"
    act: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            padding=self.kernel // 2, use_bias=self.norm == "none",
            dtype=self.dtype, name="conv",
        )(x)
        if self.norm == "bn":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        elif self.norm == "gn":
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="gn")(x)
        if self.act:
            x = nn.relu(x)
        return x


class PPM(nn.Module):
    """Pyramid pooling (reference semseg/models/modules/ppm.py)."""

    out_channels: int
    scales: Sequence[int] = (1, 2, 3, 6)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        outs = [x]
        for i, s in enumerate(self.scales):
            pooled = _adaptive_avg_pool(x, s)
            p = ConvModule(self.out_channels, 1, dtype=self.dtype,
                           name=f"stage_{i}")(pooled, train)
            outs.append(resize_bilinear(p, (h, w), align_corners=False))
        return ConvModule(self.out_channels, 3, dtype=self.dtype,
                          name="bottleneck")(
            jnp.concatenate(outs, axis=-1), train
        )


def _adaptive_avg_pool(x: jax.Array, s: int) -> jax.Array:
    b, h, w, c = x.shape
    # torch adaptive_avg_pool2d bins: [floor(i*n/s), ceil((i+1)*n/s))
    y0 = [(i * h) // s for i in range(s)]
    y1 = [-(-((i + 1) * h) // s) for i in range(s)]
    x0 = [(j * w) // s for j in range(s)]
    x1 = [-(-((j + 1) * w) // s) for j in range(s)]
    rows = []
    for i in range(s):
        cols = []
        for j in range(s):
            cols.append(x[:, y0[i] : y1[i], x0[j] : x1[j]].mean((1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, s, s, C)


class UPerHead(nn.Module):
    """UPerNet head (reference heads/upernet.py:9-47)."""

    channel: int = 128
    num_classes: int = 19
    scales: Sequence[int] = (1, 2, 3, 6)
    drop: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        f = PPM(self.channel, self.scales, dtype=self.dtype, name="ppm")(
            features[-1], train
        )
        fpn = [f]
        for i in reversed(range(len(features) - 1)):
            lateral = ConvModule(self.channel, 1, dtype=self.dtype,
                                 name=f"fpn_in_{i}")(features[i], train)
            f = lateral + resize_bilinear(
                f, lateral.shape[1:3], align_corners=False
            )
            fpn.append(
                ConvModule(self.channel, 3, dtype=self.dtype,
                           name=f"fpn_out_{i}")(f, train)
            )
        fpn.reverse()
        size = fpn[0].shape[1:3]
        fpn = [fpn[0]] + [
            resize_bilinear(p, size, align_corners=False) for p in fpn[1:]
        ]
        out = ConvModule(self.channel, 3, dtype=self.dtype, name="bottleneck")(
            jnp.concatenate(fpn, axis=-1), train
        )
        if train and self.drop > 0:
            out = nn.Dropout(self.drop)(out, deterministic=False)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(out)


class FPNHead(nn.Module):
    """Panoptic FPN head (reference heads/fpn.py)."""

    channel: int = 128
    num_classes: int = 19
    drop: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        feats = features[::-1]
        out = ConvModule(self.channel, 1, dtype=self.dtype, name="lateral_0")(
            feats[0], train
        )
        for i in range(1, len(feats)):
            out = jax.image.resize(
                out,
                (out.shape[0], out.shape[1] * 2, out.shape[2] * 2, out.shape[3]),
                method="nearest",
            )
            out = out + ConvModule(self.channel, 1, dtype=self.dtype,
                                   name=f"lateral_{i}")(feats[i], train)
            out = ConvModule(self.channel, 3, dtype=self.dtype,
                             name=f"output_{i}")(out, train)
        if train and self.drop > 0:
            out = nn.Dropout(self.drop)(out, deterministic=False)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(out)


class FCNHead(nn.Module):
    """Plain FCN head on the last feature (reference heads/fcn.py)."""

    channel: int = 256
    num_classes: int = 19
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        x = ConvModule(self.channel, 1, dtype=self.dtype, name="conv")(
            features[-1], train
        )
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="cls")(x)


class CondHead(nn.Module):
    """Conditional dynamic-filter head (reference heads/condnet.py).
    Returns (guidance_logit, seg_logit) in training, seg_logit in eval."""

    channel: int = 512
    num_classes: int = 19
    drop: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        x = ConvModule(self.channel, 1, dtype=self.dtype, name="conv")(
            features[-1], train
        )
        if train and self.drop > 0:
            x = nn.Dropout(self.drop)(x, deterministic=False)
        b, h, w, c = x.shape
        guidance = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                           name="guidance_project")(x)
        gm = jax.nn.softmax(
            guidance.reshape(b, h * w, self.num_classes).astype(jnp.float32),
            axis=1,
        ).transpose(0, 2, 1)  # (B, K, HW)
        key = x.reshape(b, h * w, c).astype(jnp.float32)
        filters = jnp.einsum("bkn,bnc->bkc", gm, key) / (h * w)
        # per-class grouped 1x1 filter projection
        weight_num = c
        proj = nn.Dense(
            c + 1, dtype=self.dtype, name="filter_project"
        )  # shared per-class projection (grouped conv equivalent)
        cond = proj(filters.astype(x.dtype))  # (B, K, C+1)
        wgt, bias = cond[..., :weight_num], cond[..., weight_num]
        seg = jnp.einsum("bnc,bkc->bnk", x.reshape(b, h * w, c), wgt) + bias[:, None]
        seg = seg.reshape(b, h, w, self.num_classes)
        if train:
            return guidance, seg
        return seg


class NMF2D(nn.Module):
    """Non-negative matrix factorization with multiplicative updates
    (reference hem.py:99-140).  Bases are sampled fresh each call from an
    explicit RNG ('nmf' collection), matching rand_init=True."""

    rank: int = 64
    train_steps: int = 6
    eval_steps: int = 7

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w
        xf = x.reshape(b, n, c).transpose(0, 2, 1).astype(jnp.float32)  # (B, D, N)
        key = self.make_rng("nmf") if self.has_rng("nmf") else jax.random.PRNGKey(0)
        bases = jax.random.uniform(key, (b, c, self.rank), jnp.float32)
        bases = bases / (jnp.linalg.norm(bases, axis=1, keepdims=True) + 1e-12)

        coef = jax.nn.softmax(
            jnp.einsum("bdn,bdr->bnr", xf, bases), axis=-1
        )

        def step(carry, _):
            bases, coef = carry
            num = jnp.einsum("bdn,bdr->bnr", xf, bases)
            den = coef @ (bases.transpose(0, 2, 1) @ bases)
            coef = coef * num / (den + 1e-6)
            num = jnp.einsum("bdn,bnr->bdr", xf, coef)
            den = bases @ (coef.transpose(0, 2, 1) @ coef)
            bases = bases * num / (den + 1e-6)
            return (bases, coef), None

        steps = self.train_steps if train else self.eval_steps
        (bases, coef), _ = jax.lax.scan(step, (bases, coef), None, length=steps)
        num = jnp.einsum("bdn,bdr->bnr", xf, bases)
        den = coef @ (bases.transpose(0, 2, 1) @ bases)
        coef = coef * num / (den + 1e-6)
        out = jnp.einsum("bdr,bnr->bdn", bases, coef)
        return out.transpose(0, 2, 1).reshape(b, h, w, c).astype(x.dtype)


class LightHamHead(nn.Module):
    """SegNeXt LightHam head (reference hem.py:142-202): uses levels 1..3."""

    ham_channels: int = 512
    num_classes: int = 25
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False):
        feats = list(features[1:])
        size = feats[0].shape[1:3]
        feats = [feats[0]] + [
            resize_bilinear(f, size, align_corners=False) for f in feats[1:]
        ]
        x = ConvModule(self.ham_channels, 1, norm="gn", dtype=self.dtype,
                       name="squeeze")(jnp.concatenate(feats, -1), train)
        # hamburger: ham_in (no norm/act) -> relu -> NMF -> ham_out (gn)
        h = nn.Conv(self.ham_channels, (1, 1), dtype=self.dtype,
                    name="ham_in")(x)
        h = nn.relu(h)
        h = NMF2D(name="ham")(h, train)
        h = ConvModule(self.ham_channels, 1, norm="gn", act=False,
                       dtype=self.dtype, name="ham_out")(h, train)
        x = nn.relu(x + h)
        x = ConvModule(self.ham_channels, 1, norm="gn", dtype=self.dtype,
                       name="align")(x, train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="conv_seg")(x)
