"""Legacy fusion/attention modules: MSPA, PSA, bidirectional cross
attention (reference semseg/models/modules/{mspa,psa,crossatt}.py).

NHWC flax; completes the modules/ inventory alongside fusion.py (FRM/FFM)
and the PPM in heads/extra_heads.py.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.ops.layers import DropPath

Dtype = Any


def _avg_pool_same(x: jax.Array, k: int) -> jax.Array:
    """AvgPool stride 1 'same' with count_include_pad=False semantics."""
    ones = jnp.ones_like(x[..., :1])
    summed = nn.avg_pool(x, (k, k), strides=(1, 1), padding="SAME") * (k * k)
    count = nn.avg_pool(ones, (k, k), strides=(1, 1), padding="SAME") * (k * k)
    return summed / count


class MSPoolAttention(nn.Module):
    """Multi-scale pool attention (mspa.py:40-58)."""

    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        u = x
        h = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="conv0")(x)
        agg = h + _avg_pool_same(h, 3) + _avg_pool_same(h, 7) + _avg_pool_same(h, 11)
        gate = jax.nn.sigmoid(
            nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv4")(agg)
        )
        return gate * u + u


class MSPABlock(nn.Module):
    """MSPA block with layer scales + channel mixing (mspa.py:60-95)."""

    dim: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ls1 = self.param("layer_scale_1",
                         nn.initializers.constant(1e-2), (self.dim,))
        ls2 = self.param("layer_scale_2",
                         nn.initializers.constant(1e-2), (self.dim,))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = MSPoolAttention(self.dim, dtype=self.dtype, name="attn")(h)
        x = x + DropPath(self.drop_path_rate)(ls1 * h, not train)

        # channel mix: ECA-style conv1d gate over channel descriptors
        desc = x.mean((1, 2))  # (B, C)
        gate = nn.Conv(1, (3,), padding=1, use_bias=False, dtype=self.dtype,
                       name="c_net")(desc[..., None])[..., 0]
        gate = jax.nn.sigmoid(gate)[:, None, None, :]
        x_c_mix = gate * x

        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Conv(int(self.dim * self.mlp_ratio), (1, 1), dtype=self.dtype,
                    name="fc1")(h)
        h = nn.Conv(int(self.dim * self.mlp_ratio), (3, 3), padding=1,
                    feature_group_count=int(self.dim * self.mlp_ratio),
                    dtype=self.dtype, name="dwconv")(h)
        h = nn.gelu(h)
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="fc2")(h)
        return x_c_mix + DropPath(self.drop_path_rate)(ls2 * h, not train)


class PSA(nn.Module):
    """Polarized self-attention, parallel variant (psa.py:6-44)."""

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c2 = self.channels
        ch = c2 // 2
        b, h, w, _ = x.shape
        # spatial pool
        v = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_v_right")(x)
        q = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_q_right")(x)
        qs = jax.nn.softmax(q.reshape(b, h * w).astype(jnp.float32), -1)
        ctx = jnp.einsum("bnc,bn->bc", v.reshape(b, h * w, ch).astype(jnp.float32), qs)
        ctx = nn.Conv(c2, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv_up")(ctx[:, None, None, :].astype(x.dtype))
        spatial = x * jax.nn.sigmoid(ctx)
        # channel pool
        g = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_q_left")(x)
        avg = g.mean((1, 2))  # (B, ch)
        theta = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_v_left")(x).reshape(b, h * w, ch)
        ctx2 = jnp.einsum("bc,bnc->bn", avg.astype(jnp.float32),
                          theta.astype(jnp.float32))
        ctx2 = jax.nn.softmax(ctx2, -1).reshape(b, h, w, 1)
        channel = x * jax.nn.sigmoid(ctx2.astype(x.dtype))
        return spatial + channel


class BidirectionalCrossAttention(nn.Module):
    """One shared similarity matrix, softmaxed both ways
    (crossatt.py:18-101)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array):
        b, n, _ = x.shape
        m = context.shape[1]
        inner = self.heads * self.dim_head
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        cn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                          name="context_norm")(context)

        def split(t):
            return t.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        qk = split(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="to_qk")(xn))
        cqk = split(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                             name="context_to_qk")(cn))
        v = split(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                           name="to_v")(xn))
        cv = split(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name="context_to_v")(cn))

        sim = jnp.einsum("bhid,bhjd->bhij", qk, cqk,
                         preferred_element_type=jnp.float32)
        sim = sim * (self.dim_head**-0.5)
        attn = jax.nn.softmax(sim, -1)
        context_attn = jax.nn.softmax(sim, -2)

        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(cv.dtype), cv,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        context_out = jnp.einsum(
            "bhij,bhid->bhjd", context_attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(context.dtype)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        context_out = context_out.transpose(0, 2, 1, 3).reshape(b, m, inner)
        return (
            nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out),
            nn.Dense(context.shape[-1], dtype=self.dtype,
                     name="context_to_out")(context_out),
        )
