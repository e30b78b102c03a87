"""Conditional DETR attention variants + learned position embedding
(reference detrex/layers/attention.py ConditionalSelfAttention /
ConditionalCrossAttention :28-469, position_embedding.py
PositionEmbeddingLearned).

Used by the DAB/Conditional-DETR family; included for detrex surface
parity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _heads(t, n_heads):
    b, n, c = t.shape
    return t.reshape(b, n, n_heads, c // n_heads).transpose(0, 2, 1, 3)


def _merge(t):
    b, h, n, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, n, h * d)


class ConditionalSelfAttention(nn.Module):
    """Content + position projected separately, then added (conditional
    DETR decoder self-attention)."""

    embed_dim: int
    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, query, query_pos, attn_mask=None, identity=None):
        c = self.embed_dim
        if identity is None:
            identity = query
        qc = nn.Dense(c, dtype=self.dtype, name="query_content_proj")(query)
        qp = nn.Dense(c, dtype=self.dtype, name="query_pos_proj")(query_pos)
        kc = nn.Dense(c, dtype=self.dtype, name="key_content_proj")(query)
        kp = nn.Dense(c, dtype=self.dtype, name="key_pos_proj")(query_pos)
        v = nn.Dense(c, dtype=self.dtype, name="value_proj")(query)
        q = _heads(qc + qp, self.num_heads)
        k = _heads(kc + kp, self.num_heads)
        vh = _heads(v, self.num_heads)
        d = c // self.num_heads
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * d**-0.5, k,
                          preferred_element_type=jnp.float32)
        if attn_mask is not None:
            attn = jnp.where(attn_mask[None, None], -1e9, attn)
        attn = jax.nn.softmax(attn, -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32).astype(vh.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="out_proj")(_merge(out))
        return identity + out


class ConditionalCrossAttention(nn.Module):
    """Decoder cross-attention where content and spatial similarities are
    computed in a concatenated head space (conditional DETR)."""

    embed_dim: int
    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, query, key, value, query_pos, key_pos,
                 query_sine_embed, is_first_layer: bool = False,
                 identity=None):
        c = self.embed_dim
        if identity is None:
            identity = query
        qc = nn.Dense(c, dtype=self.dtype, name="query_content_proj")(query)
        kc = nn.Dense(c, dtype=self.dtype, name="key_content_proj")(key)
        v = nn.Dense(c, dtype=self.dtype, name="value_proj")(value)
        kp = nn.Dense(c, dtype=self.dtype, name="key_pos_proj")(key_pos)
        if is_first_layer:
            qp = nn.Dense(c, dtype=self.dtype, name="query_pos_proj")(query_pos)
            qc = qc + qp
            kc = kc + kp
        qs = nn.Dense(c, dtype=self.dtype, name="query_pos_sine_proj")(
            query_sine_embed
        )
        nh = self.num_heads
        d = c // nh
        # concatenate content and spatial parts per head -> 2d head dim
        q = jnp.concatenate(
            [_heads(qc, nh), _heads(qs, nh)], axis=-1
        )
        k = jnp.concatenate(
            [_heads(kc, nh), _heads(kp, nh)], axis=-1
        )
        vh = _heads(v, nh)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (2 * d) ** -0.5, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32).astype(vh.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="out_proj")(_merge(out))
        return identity + out


class PositionEmbeddingLearned(nn.Module):
    """Learned row/col embeddings (detrex position_embedding.py)."""

    num_pos_feats: int = 256
    max_size: int = 50

    @nn.compact
    def __call__(self, h: int, w: int) -> jax.Array:
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.max_size, self.num_pos_feats // 2))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.max_size, self.num_pos_feats // 2))
        x = jnp.broadcast_to(col[None, :w], (h, w, self.num_pos_feats // 2))
        y = jnp.broadcast_to(row[:h, None], (h, w, self.num_pos_feats // 2))
        return jnp.concatenate([x, y], axis=-1)  # (h, w, num_pos_feats)
