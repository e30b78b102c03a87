"""Alternative detection backbones (reference detrex/modeling/backbone/:
ConvNeXt, FocalNet, EVA/ViT, InternImage — SURVEY.md §2.3).

Compact NHWC flax implementations returning {res2..res5} pyramids (ViT
returns a single-scale map like d2's ViTDet-style usage).  InternImage
builds on the DCNv3 core (ir_ads_tpu/detection/deform_conv.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ir_ads_tpu.detection.deform_conv import dcn_v3_core
from ir_ads_tpu.ops.layers import DropPath, trunc_normal_init

Dtype = Any


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path_rate: float = 0.0
    layer_scale: float = 1e-6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale), (self.dim,)
        )
        h = h * gamma
        return x + DropPath(self.drop_path_rate)(h, deterministic)


class ConvNeXt(nn.Module):
    """ConvNeXt-T/S/B (detrex backbone/convnext.py)."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = {}
        cur = 0
        for i in range(4):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=4,
                            dtype=self.dtype, name="stem")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"down_norm_{i}")(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=2,
                            dtype=self.dtype, name=f"down_{i}")(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(self.dims[i], float(dpr[cur + j]),
                                  dtype=self.dtype,
                                  name=f"block{i}_{j}")(x, not train)
            cur += self.depths[i]
            name = f"res{i + 2}"
            if name in self.out_features:
                outs[name] = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"out_norm_{i}"
                )(x)
        return outs


class FocalModulation(nn.Module):
    """Focal modulation (detrex backbone/focalnet.py)."""

    dim: int
    focal_level: int = 2
    focal_window: int = 9
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = self.dim
        qkv = nn.Dense(2 * c + self.focal_level + 1, dtype=self.dtype,
                       name="f")(x)
        q = qkv[..., :c]
        ctx = qkv[..., c : 2 * c]
        gates = qkv[..., 2 * c :]
        ctx_all = 0.0
        for l in range(self.focal_level):
            k = self.focal_window + 2 * l
            ctx = nn.Conv(c, (k, k), padding=k // 2, feature_group_count=c,
                          use_bias=False, dtype=self.dtype,
                          name=f"focal_conv_{l}")(ctx)
            ctx = nn.gelu(ctx)
            ctx_all = ctx_all + ctx * gates[..., l : l + 1]
        glob = ctx.mean((1, 2), keepdims=True)
        ctx_all = ctx_all + nn.gelu(glob) * gates[..., self.focal_level :]
        out = q * nn.Conv(c, (1, 1), dtype=self.dtype, name="h")(ctx_all)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class FocalNetBlock(nn.Module):
    dim: int
    drop_path_rate: float = 0.0
    mlp_ratio: float = 4.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = FocalModulation(self.dim, dtype=self.dtype, name="modulation")(h)
        x = x + DropPath(self.drop_path_rate)(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + DropPath(self.drop_path_rate)(h, deterministic)


class FocalNet(nn.Module):
    depths: Sequence[int] = (2, 2, 6, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.2
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        x = nn.Conv(self.dims[0], (4, 4), strides=4, dtype=self.dtype,
                    name="stem")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="stem_norm")(x)
        outs = {}
        cur = 0
        for i in range(4):
            if i > 0:
                x = nn.Conv(self.dims[i], (2, 2), strides=2,
                            dtype=self.dtype, name=f"down_{i}")(x)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"down_norm_{i}")(x)
            for j in range(self.depths[i]):
                x = FocalNetBlock(self.dims[i], float(dpr[cur + j]),
                                  dtype=self.dtype,
                                  name=f"block{i}_{j}")(x, not train)
            cur += self.depths[i]
            name = f"res{i + 2}"
            if name in self.out_features:
                outs[name] = x
        return outs


class ViT(nn.Module):
    """Plain ViT backbone (detrex EVA/eva02-style trunk, single scale)."""

    patch_size: int = 16
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    drop_path_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        p = self.patch_size
        x = nn.Conv(self.dim, (p, p), strides=p, dtype=self.dtype,
                    name="patch_embed")(x)
        b, h, w, c = x.shape
        pos = self.param("pos_embed", trunc_normal_init(0.02), (1, h, w, c))
        x = x + pos.astype(x.dtype)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        t = x.reshape(b, h * w, c)
        for i in range(self.depth):
            # attention
            hsrc = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                name=f"norm1_{i}")(t)
            qkv = nn.Dense(3 * c, dtype=self.dtype, name=f"qkv_{i}")(hsrc)
            qkv = qkv.reshape(b, -1, 3, self.num_heads, c // self.num_heads)
            q, k, v = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn * (c // self.num_heads) ** -0.5, -1)
            o = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                           preferred_element_type=jnp.float32).astype(v.dtype)
            o = o.transpose(0, 2, 1, 3).reshape(b, -1, c)
            o = nn.Dense(c, dtype=self.dtype, name=f"proj_{i}")(o)
            t = t + DropPath(float(dpr[i]))(o, not train)
            # mlp
            hsrc = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                name=f"norm2_{i}")(t)
            m = nn.Dense(4 * c, dtype=self.dtype, name=f"fc1_{i}")(hsrc)
            m = nn.gelu(m)
            m = nn.Dense(c, dtype=self.dtype, name=f"fc2_{i}")(m)
            t = t + DropPath(float(dpr[i]))(m, not train)
        out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(t)
        return {"res4": out.reshape(b, h, w, c)}


class InternImageBlock(nn.Module):
    """InternImage basic layer: DCNv3 mixer + MLP (detrex internimage.py,
    built on the DCNv3 core kernel)."""

    dim: int
    groups: int = 4
    drop_path_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        # input proj -> offsets/mask -> dcnv3 -> output proj
        v = nn.Dense(self.dim, dtype=self.dtype, name="input_proj")(h)
        dw = nn.Conv(self.dim, (3, 3), padding=1,
                     feature_group_count=self.dim, dtype=self.dtype,
                     name="offset_dw")(h)
        offsets = nn.Dense(self.groups * 9 * 2,
                           kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, name="offsets")(dw)
        mask = nn.Dense(self.groups * 9, kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name="mask")(dw)
        b, hh, ww, _ = mask.shape
        mask = jax.nn.softmax(
            mask.reshape(b, hh, ww, self.groups, 9).astype(jnp.float32), -1
        ).reshape(b, hh, ww, -1).astype(x.dtype)
        mixed = dcn_v3_core(v, offsets.astype(jnp.float32), mask,
                            kernel=3, groups=self.groups)
        mixed = nn.Dense(self.dim, dtype=self.dtype, name="output_proj")(mixed)
        x = x + DropPath(self.drop_path_rate)(mixed, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + DropPath(self.drop_path_rate)(h, deterministic)


class InternImage(nn.Module):
    depths: Sequence[int] = (4, 4, 18, 4)
    dims: Sequence[int] = (64, 128, 256, 512)
    groups: Sequence[int] = (4, 8, 16, 32)
    drop_path_rate: float = 0.2
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        x = nn.Conv(self.dims[0] // 2, (3, 3), strides=2, padding=1,
                    dtype=self.dtype, name="stem1")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="stem_norm1")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.dims[0], (3, 3), strides=2, padding=1,
                    dtype=self.dtype, name="stem2")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="stem_norm2")(x)
        outs = {}
        cur = 0
        for i in range(4):
            if i > 0:
                x = nn.Conv(self.dims[i], (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name=f"down_{i}")(x)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"down_norm_{i}")(x)
            for j in range(self.depths[i]):
                x = InternImageBlock(self.dims[i], self.groups[i],
                                     float(dpr[cur + j]), dtype=self.dtype,
                                     name=f"block{i}_{j}")(x, not train)
            cur += self.depths[i]
            name = f"res{i + 2}"
            if name in self.out_features:
                outs[name] = x
        return outs


from ir_ads_tpu.models.projects.mvit import MViT  # noqa: E402
from ir_ads_tpu.models.projects.vitdet import ViTDet  # noqa: E402

BACKBONES = {
    "convnext": ConvNeXt,
    "focalnet": FocalNet,
    "vit": ViT,
    "internimage": InternImage,
    "mvit": MViT,
    "vitdet": ViTDet,
}


# ------------------------------------------------------------------- EVA-02
def _rope_freqs(head_dim: int, seq_len: int, pt_seq_len: int = 16,
                theta: float = 10000.0):
    """2D VisionRotaryEmbeddingFast tables (reference
    detrex/modeling/backbone/eva_02_utils.py:309-351): per-axis frequencies
    on a pt_seq_len-normalized grid, each repeated in interleaved pairs,
    then y/x broadcast-concatenated.  Returns (seq*seq, head_dim) cos/sin."""
    dim = head_dim // 2  # per-axis rope dim (= half_head_dim, eva_02.py:367)
    freqs = 1.0 / (
        theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim)
    )
    t = np.arange(seq_len, dtype=np.float64) / seq_len * pt_seq_len
    f = np.einsum("i,j->ij", t, freqs)  # (seq, dim//2)
    f = np.repeat(f, 2, axis=-1)  # (seq, dim) interleaved pairs
    fy = np.broadcast_to(f[:, None, :], (seq_len, seq_len, dim))
    fx = np.broadcast_to(f[None, :, :], (seq_len, seq_len, dim))
    full = np.concatenate([fy, fx], axis=-1).reshape(-1, 2 * dim)
    return (
        jnp.asarray(np.cos(full), jnp.float32),
        jnp.asarray(np.sin(full), jnp.float32),
    )


def _rotate_half(x: jax.Array) -> jax.Array:
    """(..., (d r)) with r=2 interleaved -> (-x2, x1) pairs
    (eva_02_utils.py:250-254)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    return jnp.stack([-x[..., 1], x[..., 0]], axis=-1).reshape(
        *x.shape[:-2], -1
    )


def _apply_rope(t: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """t: (..., N, head_dim); cos/sin (N, head_dim)."""
    return t * cos + _rotate_half(t) * sin


class SwiGLU(nn.Module):
    """w3(silu(w1 x) * w2 x) with sub-LN on the hidden
    (reference eva_02.py:39-63, subln=True in EVA-02)."""

    hidden: int
    subln: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        x1 = nn.Dense(self.hidden, dtype=self.dtype, name="w1")(x)
        x2 = nn.Dense(self.hidden, dtype=self.dtype, name="w2")(x)
        h = nn.silu(x1) * x2
        if self.subln:
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ffn_ln")(h)
        return nn.Dense(d, dtype=self.dtype, name="w3")(h)


class EVA02Attention(nn.Module):
    """Separate q/k/v projections (k bias-free), rope on q and k
    (reference eva_02.py:66-137)."""

    dim: int
    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, rope) -> jax.Array:
        b, h, w, c = x.shape
        n = h * w
        hd = self.dim // self.num_heads
        xf = x.reshape(b, n, c)
        q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(xf)
        k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     name="k_proj")(xf)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(xf)

        def heads(t):
            return t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        cos, sin = rope
        q = _apply_rope(q.astype(jnp.float32), cos, sin).astype(v.dtype)
        k = _apply_rope(k.astype(jnp.float32), cos, sin).astype(v.dtype)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * hd**-0.5, k,
            preferred_element_type=jnp.float32,
        )
        p = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        o = nn.Dense(self.dim, dtype=self.dtype, name="proj")(o)
        return o.reshape(b, h, w, self.dim)


class EVA02ViT(nn.Module):
    """EVA-02 ViT trunk (reference detrex/modeling/backbone/eva_02.py:
    290-475): abs pos embed + 2D rope attention + SwiGLU blocks, windowed
    except at ``global_indexes``.  Returns {"last_feat"} at stride
    ``patch_size`` for SimpleFeaturePyramid, like ViTDet."""

    img_size: int = 1024
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4 * 2 / 3
    window_size: int = 16
    global_indexes: Sequence[int] = (2, 5, 8, 11)
    pt_hw_seq_len: int = 16
    drop_path_rate: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        from ir_ads_tpu.models.projects.vitdet import (
            window_partition,
            window_unpartition,
        )
        from ir_ads_tpu.ops.layers import DropPath, trunc_normal_init

        p = self.patch_size
        x = nn.Conv(self.dim, (p, p), strides=p, dtype=self.dtype,
                    name="patch_embed")(x)
        b, h, w, c = x.shape
        ph = pw = self.img_size // self.patch_size
        pos = self.param("pos_embed", trunc_normal_init(0.02), (1, ph, pw, c))
        if (ph, pw) != (h, w):
            pos = jax.image.resize(
                pos.astype(jnp.float32), (1, h, w, c), method="cubic"
            )
        x = x + pos.astype(x.dtype)

        hd = self.dim // self.num_heads
        rope_glb = _rope_freqs(hd, max(h, w), self.pt_hw_seq_len)
        rope_win = _rope_freqs(hd, self.window_size, self.pt_hw_seq_len)
        # non-square global grids: slice the (S, S) table to (h, w)
        if h != w:
            s = max(h, w)
            cos, sin = rope_glb
            cos = cos.reshape(s, s, -1)[:h, :w].reshape(h * w, -1)
            sin = sin.reshape(s, s, -1)[:h, :w].reshape(h * w, -1)
            rope_glb = (cos, sin)

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            shortcut = x
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm1_{i}")(x)
            attn = EVA02Attention(
                self.dim, self.num_heads, dtype=self.dtype, name=f"attn_{i}"
            )
            if i in self.global_indexes:
                y = attn(y, rope_glb)
            else:
                win, pad_hw = window_partition(y, self.window_size)
                nw = win.shape[0]
                win = win.reshape(nw, self.window_size, self.window_size, c)
                win = attn(win, rope_win)
                win = win.reshape(nw, self.window_size * self.window_size, c)
                y = window_unpartition(win, self.window_size, pad_hw, (h, w))
            x = shortcut + DropPath(float(dpr[i]))(y, not train)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm2_{i}")(x)
            y = SwiGLU(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                       name=f"mlp_{i}")(y)
            x = x + DropPath(float(dpr[i]))(y, not train)
        return {"last_feat": x}
