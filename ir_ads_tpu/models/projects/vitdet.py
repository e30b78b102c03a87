"""ViTDet: plain-ViT detection backbone + SimpleFeaturePyramid.

Reference: detectron2/modeling/backbone/vit.py (ViT :16-359,
SimpleFeaturePyramid :361-476) and backbone/utils.py (window_partition
:16-37, window_unpartition :40-60, get_rel_pos :63-93,
add_decomposed_rel_pos :96-125), used by the vendored
detectron2/projects/ViTDet configs.

TPU-native notes: NHWC throughout; window partition is reshape/transpose
(static shapes — no padding branch needed when the config pads inputs to a
multiple of the window, and a static pad otherwise); decomposed relative
position biases are einsums that XLA fuses into the attention matmuls.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ir_ads_tpu.ops.layers import DropPath, trunc_normal_init

Dtype = Any


def window_partition(x: jax.Array, ws: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """(B,H,W,C) -> (B*nW, ws, ws, C) with zero pad to a multiple of ws
    (backbone/utils.py:16-37)."""
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return (
        x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c),
        (hp, wp),
    )


def window_unpartition(
    win: jax.Array, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jax.Array:
    """Inverse of window_partition (backbone/utils.py:40-60)."""
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Slice (and linearly resize if needed) the (L, C) rel-pos table to a
    (q_size, k_size, C) lookup (backbone/utils.py:63-93)."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        # linear interpolation along the length axis (torch interpolate
        # mode='linear', align_corners=False semantics)
        src = rel_pos.shape[0]
        pos = (jnp.arange(max_rel) + 0.5) * (src / max_rel) - 0.5
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, src - 1)
        hi = jnp.clip(lo + 1, 0, src - 1)
        t = jnp.clip(pos - lo, 0.0, 1.0)[:, None]
        rel_pos = rel_pos[lo] * (1 - t) + rel_pos[hi] * t
    qc = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    kc = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (qc - kc) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[jnp.asarray(rel.astype(np.int64))]


def add_decomposed_rel_pos(
    attn: jax.Array,
    q: jax.Array,
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    q_size: Tuple[int, int],
    k_size: Tuple[int, int],
) -> jax.Array:
    """MViTv2-style decomposed relative position bias
    (backbone/utils.py:96-125).  attn: (B, q_h*q_w, k_h*k_w), q: (B, q_h*q_w, C)."""
    qh, qw = q_size
    kh, kw = k_size
    rh = get_rel_pos(qh, kh, rel_pos_h).astype(q.dtype)
    rw = get_rel_pos(qw, kw, rel_pos_w).astype(q.dtype)
    b, _, dim = q.shape
    rq = q.reshape(b, qh, qw, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
    attn = attn.reshape(b, qh, qw, kh, kw)
    attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
    return attn.reshape(b, qh * qw, kh * kw)


class _Attention(nn.Module):
    """Multi-head attention over a 2D token grid with optional decomposed
    rel-pos (vit.py Attention)."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * self.num_heads, h * w, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum(
            "bqd,bkd->bqk", q * hd ** -0.5, k,
            preferred_element_type=jnp.float32,
        )
        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, hd),
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, hd),
            )
            attn = add_decomposed_rel_pos(
                attn, q.astype(jnp.float32), rel_h, rel_w, (h, w), (h, w)
            )
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        o = jnp.einsum("bqk,bkd->bqd", attn, v)
        o = o.reshape(b, self.num_heads, h * w, hd).transpose(0, 2, 1, 3)
        o = o.reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(o)


class ViTDet(nn.Module):
    """Plain ViT trunk with per-block windowed attention except at the
    ``global_attn_indexes`` (vit.py:16-359).  Returns a single stride-16 map
    under key ``last_feat`` for SimpleFeaturePyramid."""

    img_size: int = 1024
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    drop_path_rate: float = 0.1
    use_rel_pos: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        p = self.patch_size
        x = nn.Conv(
            self.dim, (p, p), strides=p, dtype=self.dtype, name="patch_embed"
        )(x)
        b, h, w, c = x.shape
        # pos_embed is stored at the pretrain grid (img_size/patch_size) and
        # resized to the runtime grid like the reference's get_abs_pos
        # (vit.py/utils.py: bicubic interpolate, align_corners=False); this
        # keeps parameter shapes checkpoint-compatible across resolutions.
        # Note: d2 MAE checkpoints carry a cls token in pos_embed — the
        # importer must drop it before reshaping to the grid.
        ph = pw = self.img_size // self.patch_size
        pos = self.param("pos_embed", trunc_normal_init(0.02), (1, ph, pw, c))
        if (ph, pw) != (h, w):
            pos = jax.image.resize(
                pos.astype(jnp.float32), (1, h, w, c), method="cubic"
            )
        x = x + pos.astype(x.dtype)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            shortcut = x
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm1_{i}")(x)
            if i in self.global_attn_indexes:
                y = _Attention(
                    self.dim, self.num_heads, self.use_rel_pos,
                    (h, w), dtype=self.dtype, name=f"attn_{i}",
                )(y)
            else:
                win, pad_hw = window_partition(y, self.window_size)
                win = _Attention(
                    self.dim, self.num_heads, self.use_rel_pos,
                    (self.window_size, self.window_size),
                    dtype=self.dtype, name=f"attn_{i}",
                )(win)
                y = window_unpartition(win, self.window_size, pad_hw, (h, w))
            x = shortcut + DropPath(float(dpr[i]))(y, not train)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm2_{i}")(x)
            y = nn.Dense(4 * self.dim, dtype=self.dtype, name=f"fc1_{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim, dtype=self.dtype, name=f"fc2_{i}")(y)
            x = x + DropPath(float(dpr[i]))(y, not train)
        return {"last_feat": x}


class SimpleFeaturePyramid(nn.Module):
    """Build {p2..p6} from a single stride-16 ViT map (vit.py:361-476):
    scale 4.0 = two stride-2 transposed convs, 2.0 = one, 1.0 = identity,
    0.5 = 2x2 max-pool; each followed by 1x1 + 3x3 convs with LayerNorm.
    ``top_block_levels`` extra max-pool levels extend the deepest output
    (d2 LastLevelMaxPool)."""

    out_channels: int = 256
    scale_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    top_block_levels: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feat: jax.Array) -> Dict[str, jax.Array]:
        dim = feat.shape[-1]
        outs = {}
        base_stride = 16
        for idx, scale in enumerate(self.scale_factors):
            x = feat
            if scale == 4.0:
                x = nn.ConvTranspose(
                    dim // 2, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name=f"up_{idx}_a",
                )(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"up_{idx}_ln")(x)
                x = nn.gelu(x)
                x = nn.ConvTranspose(
                    dim // 4, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name=f"up_{idx}_b",
                )(x)
            elif scale == 2.0:
                x = nn.ConvTranspose(
                    dim // 2, (2, 2), strides=(2, 2),
                    dtype=self.dtype, name=f"up_{idx}",
                )(x)
            elif scale == 1.0:
                pass
            elif scale == 0.5:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                raise NotImplementedError(f"scale_factor={scale}")
            x = nn.Conv(
                self.out_channels, (1, 1), use_bias=False,
                dtype=self.dtype, name=f"lateral_{idx}",
            )(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"lateral_{idx}_ln")(x)
            x = nn.Conv(
                self.out_channels, (3, 3), padding=1, use_bias=False,
                dtype=self.dtype, name=f"output_{idx}",
            )(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"output_{idx}_ln")(x)
            stage = int(np.log2(base_stride / scale))
            outs[f"p{stage}"] = x
        last = max(int(k[1:]) for k in outs)
        for i in range(self.top_block_levels):
            outs[f"p{last + 1 + i}"] = nn.max_pool(
                outs[f"p{last + i}"], (1, 1), strides=(2, 2)
            )
        return outs
