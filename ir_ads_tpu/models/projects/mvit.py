"""MViTv2 backbone (Improved Multiscale Vision Transformers).

Reference: detectron2/modeling/backbone/mvit.py (attention_pool :24-33,
MultiScaleAttention :36-178, MultiScaleBlock :180-270, MViT :272-455), used
by the vendored detectron2/projects/MViTv2 configs.

TPU-native notes: NHWC; q/k/v pooling is a per-head depthwise conv (maps to
XLA's grouped conv); hybrid window attention reuses the ViTDet
window_partition helpers; decomposed rel-pos shares add_decomposed_rel_pos.
All shapes static under jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ir_ads_tpu.models.projects.vitdet import (
    add_decomposed_rel_pos,
    window_partition,
    window_unpartition,
)
from ir_ads_tpu.ops.layers import DropPath, trunc_normal_init

Dtype = Any


class _PoolNorm(nn.Module):
    """attention_pool (mvit.py:24-33): depthwise conv pool + LayerNorm on a
    (B', H, W, Ch) per-head map."""

    channels: int
    kernel: int = 3
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.channels, (self.kernel, self.kernel),
            strides=self.stride, padding=self.kernel // 2,
            feature_group_count=self.channels, use_bias=False,
            dtype=self.dtype, name="pool",
        )(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


class MultiScaleAttention(nn.Module):
    """Pooled multi-head attention (mvit.py:36-178)."""

    dim: int
    dim_out: int
    num_heads: int
    stride_q: int = 1
    stride_kv: int = 1
    pool_kernel: int = 3
    residual_pooling: bool = True
    window_size: int = 0
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (56, 56)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        nh = self.num_heads
        hd = self.dim_out // nh
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h, w, 3, nh, hd).transpose(3, 0, 4, 1, 2, 5)
        qkv = qkv.reshape(3, b * nh, h, w, hd)
        q = _PoolNorm(hd, self.pool_kernel, self.stride_q,
                      dtype=self.dtype, name="pool_q")(qkv[0])
        k = _PoolNorm(hd, self.pool_kernel, self.stride_kv,
                      dtype=self.dtype, name="pool_k")(qkv[1])
        v = _PoolNorm(hd, self.pool_kernel, self.stride_kv,
                      dtype=self.dtype, name="pool_v")(qkv[2])

        ori_q = q
        if self.window_size:
            q_ws = self.window_size // self.stride_q
            kv_ws = self.window_size // self.stride_kv
            q, q_pad = window_partition(q, q_ws)
            k, _ = window_partition(k, kv_ws)
            v, _ = window_partition(v, kv_ws)
            q_hw, kv_hw = (q_ws, q_ws), (kv_ws, kv_ws)
        else:
            q_hw, kv_hw = q.shape[1:3], k.shape[1:3]

        qf = q.reshape(q.shape[0], q_hw[0] * q_hw[1], hd)
        kf = k.reshape(k.shape[0], kv_hw[0] * kv_hw[1], hd)
        vf = v.reshape(v.shape[0], kv_hw[0] * kv_hw[1], hd)
        attn = jnp.einsum(
            "bqd,bkd->bqk", qf * hd ** -0.5, kf,
            preferred_element_type=jnp.float32,
        )
        if self.use_rel_pos:
            # Table size follows the reference (mvit.py:121-125): full input
            # resolution divided by the strides — NOT the window size — so
            # parameter shapes match detectron2 checkpoints even for windowed
            # blocks; get_rel_pos interpolates down to the runtime extent.
            size = max(self.input_size)
            rel_dim = 2 * max(size // self.stride_q, size // self.stride_kv) - 1
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (rel_dim, hd)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (rel_dim, hd)
            )
            attn = add_decomposed_rel_pos(
                attn, qf.astype(jnp.float32), rel_h, rel_w, q_hw, kv_hw
            )
        attn = jax.nn.softmax(attn, axis=-1).astype(vf.dtype)
        o = jnp.einsum("bqk,bkd->bqd", attn, vf)
        o = o.reshape(o.shape[0], q_hw[0], q_hw[1], hd)
        if self.window_size:
            o = window_unpartition(o, q_ws, q_pad, ori_q.shape[1:3])
        if self.residual_pooling:
            o = o + ori_q
        oh, ow = o.shape[1:3]
        o = o.reshape(b, nh, oh, ow, hd).transpose(0, 2, 3, 1, 4)
        o = o.reshape(b, oh, ow, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(o)


class MultiScaleBlock(nn.Module):
    """Transformer block with pooled attention (mvit.py:180-270)."""

    dim: int
    dim_out: int
    num_heads: int
    stride_q: int = 1
    stride_kv: int = 1
    window_size: int = 0
    use_rel_pos: bool = True
    residual_pooling: bool = True
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    input_size: Tuple[int, int] = (56, 56)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        xn = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        att = MultiScaleAttention(
            self.dim, self.dim_out, self.num_heads,
            stride_q=self.stride_q, stride_kv=self.stride_kv,
            window_size=self.window_size, use_rel_pos=self.use_rel_pos,
            residual_pooling=self.residual_pooling,
            input_size=self.input_size, dtype=self.dtype, name="attn",
        )(xn)
        if self.dim != self.dim_out:
            x = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(xn)
        if self.stride_q > 1:
            # skip-connection pooling: max-pool with the same stride
            k = self.stride_q + 1
            x = nn.max_pool(
                x, (k, k), strides=(self.stride_q, self.stride_q),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
            )
        x = x + DropPath(self.drop_path_rate)(att, deterministic)
        xn = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        m = nn.Dense(int(self.dim_out * self.mlp_ratio),
                     kernel_init=trunc_normal_init(0.02),
                     dtype=self.dtype, name="fc1")(xn)
        m = nn.gelu(m)
        m = nn.Dense(self.dim_out, kernel_init=trunc_normal_init(0.02),
                     dtype=self.dtype, name="fc2")(m)
        return x + DropPath(self.drop_path_rate)(m, deterministic)


class MViT(nn.Module):
    """MViTv2-T default (mvit.py:272-455): 16 blocks, stages end at
    last_block_indexes, dim/heads double and kv-stride halves per stage;
    hybrid window attention (global in the last three stages' final blocks).
    Returns {scale2..scale5} NHWC pyramids."""

    embed_dim: int = 96
    depth: int = 16
    num_heads: int = 1
    last_block_indexes: Sequence[int] = (0, 2, 11, 15)
    adaptive_kv_stride: int = 4
    adaptive_window_size: int = 56
    drop_path_rate: float = 0.0
    use_rel_pos: bool = True
    out_features: Sequence[str] = ("scale2", "scale3", "scale4", "scale5")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        x = nn.Conv(
            self.embed_dim, (7, 7), strides=4, padding=3,
            dtype=self.dtype, name="patch_embed",
        )(x)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        dim, dim_out = self.embed_dim, self.embed_dim
        heads = self.num_heads
        stride_kv = self.adaptive_kv_stride
        window = self.adaptive_window_size
        input_size = x.shape[1:3]
        outs: Dict[str, jax.Array] = {}
        stage = 2
        for i in range(self.depth):
            stride_kv_ = stride_kv * 2 if i in (
                self.last_block_indexes[1], self.last_block_indexes[2]
            ) else stride_kv
            window_ = 0 if i in self.last_block_indexes[1:] else window
            x = MultiScaleBlock(
                dim, dim_out, heads,
                stride_q=2 if i - 1 in self.last_block_indexes else 1,
                stride_kv=stride_kv_,
                window_size=window_,
                use_rel_pos=self.use_rel_pos,
                drop_path_rate=float(dpr[i]),
                input_size=input_size,
                dtype=self.dtype, name=f"block_{i}",
            )(x, not train)
            dim = dim_out
            if i in self.last_block_indexes:
                name = f"scale{stage}"
                if name in self.out_features:
                    outs[name] = nn.LayerNorm(
                        epsilon=1e-6, dtype=self.dtype, name=f"{name}_norm"
                    )(x)
                dim_out *= 2
                heads *= 2
                stride_kv = max(stride_kv // 2, 1)
                stage += 1
            if i - 1 in self.last_block_indexes:
                window = window // 2
                input_size = (input_size[0] // 2, input_size[1] // 2)
        return outs
