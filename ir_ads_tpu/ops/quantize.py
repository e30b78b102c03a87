"""EMA vector quantizer (reference utils/quantize.py:6-82 — shipped unused
by the reference; included for capability parity).

Functional JAX: the codebook + EMA accumulators are an explicit state
pytree; ``vq_update`` returns the quantized codes and the new state.
Dead codes (EMA cluster size below a threshold) are reassigned to random
batch vectors, as in the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class VQState(NamedTuple):
    codebook: jax.Array  # (K, D)
    ema_count: jax.Array  # (K,)
    ema_sum: jax.Array  # (K, D)


def vq_init(key: jax.Array, num_codes: int, dim: int) -> VQState:
    cb = jax.random.normal(key, (num_codes, dim)) * 0.1
    return VQState(cb, jnp.zeros(num_codes), jnp.array(cb))


def vq_lookup(state: VQState, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x (..., D) -> (codes (...,), quantized (..., D)) with a
    straight-through gradient."""
    flat = x.reshape(-1, x.shape[-1])
    d = (
        jnp.sum(flat**2, -1, keepdims=True)
        - 2 * flat @ state.codebook.T
        + jnp.sum(state.codebook**2, -1)[None]
    )
    codes = jnp.argmin(d, axis=-1)
    quant = state.codebook[codes].reshape(x.shape)
    quant = x + jax.lax.stop_gradient(quant - x)  # straight-through
    return codes.reshape(x.shape[:-1]), quant


def vq_update(
    state: VQState,
    x: jax.Array,
    key: jax.Array,
    decay: float = 0.99,
    eps: float = 1e-5,
    dead_threshold: float = 1.0,
) -> Tuple[jax.Array, jax.Array, VQState]:
    """One training step: lookup + EMA codebook update + dead-code
    reassignment.  Returns (codes, quantized, new_state)."""
    flat = x.reshape(-1, x.shape[-1])
    codes, quant = vq_lookup(state, x)
    onehot = jax.nn.one_hot(codes.reshape(-1), state.codebook.shape[0])
    count = onehot.sum(0)
    vec_sum = onehot.T @ flat

    ema_count = state.ema_count * decay + count * (1 - decay)
    ema_sum = state.ema_sum * decay + vec_sum * (1 - decay)
    n = ema_count.sum()
    stable = (ema_count + eps) / (n + state.codebook.shape[0] * eps) * n
    codebook = ema_sum / stable[:, None]

    # dead-code reassignment: codes with tiny usage jump to random inputs
    dead = ema_count < dead_threshold * (1 - decay)
    rand_idx = jax.random.randint(
        key, (state.codebook.shape[0],), 0, flat.shape[0]
    )
    codebook = jnp.where(dead[:, None], flat[rand_idx], codebook)
    ema_sum = jnp.where(dead[:, None], flat[rand_idx], ema_sum)
    ema_count = jnp.where(dead, jnp.ones_like(ema_count), ema_count)

    return codes, quant, VQState(codebook, ema_count, ema_sum)
