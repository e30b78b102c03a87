"""Legacy MiT (SegFormer) dual-stream backbone — CMNeXt-B2/B4/B5.

Reference: semseg/models/backbones/cmnext.py:16-830 — the same MAPA
adapter / MPG prompting / DSCF fusion recipe as the Swin flagship, applied
to SegFormer MiT blocks (overlapping patch embeds, spatial-reduction
attention, Mix-FFN with depthwise conv).  Differences from the Swin
variant, replicated here:

  * the MPG block is the additive fuse (D_fc1(rgb) + D_fc2(dte) -> U_fc1),
    no TFTS prompt modulation (cmnext.py:197-216), added to BOTH streams;
  * adapters use ratio 0.25 (cmnext.py:130) and attach inside the FFN
    residual: x + drop_path(mlp(norm2 x) + 0.5 * adapter(x)) (CEBlock,
    cmnext.py:181-194);
  * DSCF blocks use ratio 0.25 and unit deform_weight init.

NHWC, shared-weight dual-stream, reuses the DAttentionMM fusion op.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ir_ads_tpu.models.backbones.swin import Adapter, DeformMPGBlock
from ir_ads_tpu.ops.layers import DropPath, trunc_normal_init

Dtype = Any

MIT_SETTINGS = {
    # name: (embed_dims, depths)  (reference cmnext_settings, cmnext.py:679)
    "B0": ((32, 64, 160, 256), (2, 2, 2, 2)),
    "B1": ((64, 128, 320, 512), (2, 2, 2, 2)),
    "B2": ((64, 128, 320, 512), (3, 4, 6, 3)),
    "B3": ((64, 128, 320, 512), (3, 4, 18, 3)),
    "B4": ((64, 128, 320, 512), (3, 8, 27, 3)),
    "B5": ((64, 128, 320, 512), (3, 6, 40, 3)),
}


class SRAttention(nn.Module):
    """Spatial-reduction attention (reference Attention, cmnext.py:16-71)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, H, W, C)
        b, h, w, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                     name="q")(x)
        q = q.reshape(b, h * w, self.num_heads, hd).transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                c, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                dtype=self.dtype, name="sr",
            )(x)
            kv_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="sr_norm")(
                kv_in
            )
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                      name="kv")(kv_in)
        kv = kv.reshape(b, n_kv, 2, self.num_heads, hd)
        k = kv[:, :, 0].transpose(0, 2, 1, 3)
        v = kv[:, :, 1].transpose(0, 2, 1, 3)

        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q * (hd**-0.5), k,
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                        name="proj")(out)


class MixFFN(nn.Module):
    """fc1 -> depthwise 3x3 -> gelu -> fc2 (reference MLP+DWConv)."""

    hidden_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.Conv(
            self.hidden_dim, (3, 3), padding=1,
            feature_group_count=self.hidden_dim,
            dtype=self.dtype, name="dwconv",
        )(h)
        h = nn.gelu(h)
        return nn.Dense(c, dtype=self.dtype, name="fc2")(h)


class CEBlock(nn.Module):
    """MiT block with per-modality adapters (reference CEBlock,
    cmnext.py:163-194): the 0.5-scaled adapter joins the FFN inside the
    drop-path residual."""

    dim: int
    num_heads: int
    sr_ratio: int
    drop_path_rate: float = 0.0
    adapter_ratio: float = 0.25
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, sub_mode: str, deterministic: bool = True
    ) -> jax.Array:
        attn = SRAttention(
            self.dim, self.num_heads, self.sr_ratio, dtype=self.dtype,
            name="attn",
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x))
        x = x + DropPath(self.drop_path_rate)(attn, deterministic)

        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        mlp_out = MixFFN(self.dim * 4, dtype=self.dtype, name="mlp")(xn)
        adapter = Adapter(
            mlp_ratio=self.adapter_ratio, skip_connect=False,
            dtype=self.dtype, name=f"adapter_{sub_mode}",
        )(x, deterministic)
        return x + DropPath(self.drop_path_rate)(
            mlp_out + 0.5 * adapter, deterministic
        )


class AddMPGBlock(nn.Module):
    """Additive MPG fuse (reference MPGBlock, cmnext.py:197-216)."""

    ratio: float = 0.25
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        dim = a.shape[-1]
        hidden = int(dim * self.ratio)
        fa = nn.Dense(hidden, dtype=self.dtype, name="D_fc1")(a)
        fb = nn.Dense(hidden, dtype=self.dtype, name="D_fc2")(b)
        return nn.Dense(dim, dtype=self.dtype, name="U_fc1")(fa + fb)


class MiTDualStream(nn.Module):
    """Dual-stream MiT backbone returning the fused 4-scale pyramid
    (reference CMNeXt backbone forward, cmnext.py:752-825).

    Note the MiT variant returns only the fused features (single decode
    head downstream), unlike the Swin flagship's 3 pyramids."""

    variant: str = "B2"
    drop_path_rate: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x_rgb: jax.Array, x_dte: jax.Array, train: bool = False
    ) -> List[jax.Array]:
        dims, depths = MIT_SETTINGS[self.variant]
        dpr = np.linspace(0.0, self.drop_path_rate, sum(depths))
        heads = (1, 2, 5, 8)
        srs = (8, 4, 2, 1)
        patch = ((7, 4), (3, 2), (3, 2), (3, 2))  # (kernel, stride)
        d_strides = (8, 4, 2, 1)
        d_groups = (1, 2, 4, 8)
        d_heads = (2, 4, 8, 16)

        outs = []
        cur = 0
        for i in range(4):
            k, s = patch[i]
            x_rgb = nn.Conv(
                dims[i], (k, k), strides=(s, s), padding=k // 2,
                dtype=self.dtype, name=f"patch_embed{i + 1}",
            )(x_rgb)
            x_rgb = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"patch_norm{i + 1}"
            )(x_rgb)
            x_dte = nn.Conv(
                dims[i], (k, k), strides=(s, s), padding=k // 2,
                dtype=self.dtype, name=f"extra_patch_embed{i + 1}",
            )(x_dte)
            x_dte = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"extra_patch_norm{i + 1}"
            )(x_dte)

            fuse = AddMPGBlock(dtype=self.dtype, name=f"mpg_{i}")(x_rgb, x_dte)
            x_rgb = x_rgb + fuse
            x_dte = x_dte + fuse

            for j in range(depths[i]):
                block = CEBlock(
                    dim=dims[i], num_heads=heads[i], sr_ratio=srs[i],
                    drop_path_rate=float(dpr[cur + j]),
                    dtype=self.dtype, name=f"block{i + 1}_{j}",
                )
                x_rgb = block(x_rgb, "rgb", not train)
                x_dte = block(x_dte, "dte", not train)
            cur += depths[i]

            r_out = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"norm{i + 1}"
            )(x_rgb)
            d_out = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"extra_norm{i + 1}"
            )(x_dte)
            fused = DeformMPGBlock(
                dim=dims[i], stride=d_strides[i], n_groups=d_groups[i],
                n_heads=d_heads[i], level=3, ratio=0.25,  # unit deform weight
                dtype=self.dtype, name=f"deform_mpg_{i}",
            )(r_out, d_out, train)
            outs.append(fused)
            x_rgb, x_dte = r_out, d_out

        return outs

    @property
    def channels(self) -> Tuple[int, ...]:
        return MIT_SETTINGS[self.variant][0]
