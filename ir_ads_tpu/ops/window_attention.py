"""Window multi-head self-attention (W-MSA / SW-MSA) for Swin on TPU.

Semantics follow the reference WindowMSA / ShiftWindowMSA
(semseg/models/backbones/swin.py:23-285): relative-position-biased attention
inside ``window x window`` tiles, with optional cyclic shift and the shifted
attention mask.

TPU design notes:
  * Everything here is static-shape.  The relative-position index table and
    the SW-MSA shift mask depend only on (H, W, window, shift), all of which
    are Python ints at trace time, so they are baked as compile-time
    constants (numpy) instead of being computed on device every step, as the
    reference does (swin.py:200-220).
  * The attention itself is a batch of (N, N) matmuls with N = window**2
    (144 for window 12) — MXU-friendly.  ``window_attention`` is the plain
    XLA path; ``ir_ads_tpu.ops.pallas_window_attention`` provides the fused
    Pallas kernel and must match this implementation (tests/test_window_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B * nWh * nWw, ws*ws, C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """Inverse of window_partition: (B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww, wh*ww) index into the (2wh-1)(2ww-1) bias table.

    Matches the reference's double_step_seq construction + flip
    (swin.py:64-69): index[i, j] encodes the (dy, dx) displacement between
    tokens i and j in a window.
    """
    seq = (
        np.arange(0, (2 * ww - 1) * wh, 2 * ww - 1)[:, None]
        + np.arange(0, ww, 1)[None, :]
    ).reshape(1, -1)
    idx = seq + seq.T
    return idx[:, ::-1].copy()


@functools.lru_cache(maxsize=None)
def shift_window_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """SW-MSA attention mask, (nW, ws*ws, ws*ws) float32 with 0 / -100.

    Identical region labelling to the reference (swin.py:200-220): three
    slices per axis mark the wrapped-around regions after the cyclic shift;
    tokens from different regions must not attend to each other.
    """
    img = np.zeros((hp, wp), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    # partition into windows
    img = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    wins = img.reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array],
    scale: float,
) -> jax.Array:
    """Core windowed attention.

    Args:
      q, k, v: (B*nW, heads, N, head_dim)
      bias: (heads, N, N) relative position bias (already gathered).
      mask: optional (nW, N, N) additive mask; broadcast over batch & heads.
      scale: q scaling.

    Returns:
      (B*nW, heads, N, head_dim)
    """
    bn, nh, n, d = q.shape
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32
    )
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bn // nw, nw, nh, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(bn, nh, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum(
        "bhnm,bhmd->bhnd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def gather_rel_pos_bias(table: jax.Array, wh: int, ww: int) -> jax.Array:
    """Gather the (heads, N, N) bias from the ((2wh-1)(2ww-1), heads) table.

    custom_vjp: XLA lowers the natural vjp (scatter-add of N^2 rows into
    529 table rows) to a serial scatter that profiled 1.38 ms per (stream,
    block) at stage 2 — ~4600x its flop count (r5f pallas-arm profile,
    fusion.21-24).  The backward here is the algebraically identical
    one-hot contraction dT = onehot(idx)^T @ dbias_flat: one (T, N^2) x
    (N^2, heads) MXU dot built from an iota compare."""
    idx = jnp.asarray(relative_position_index(wh, ww).reshape(-1))
    n = wh * ww
    bias = jnp.take(table, idx, axis=0).reshape(n, n, -1)
    return bias.transpose(2, 0, 1)


def _gather_rpb_fwd(table, wh, ww):
    return gather_rel_pos_bias(table, wh, ww), None


def _gather_rpb_bwd(wh, ww, res, g):
    del res
    t_rows = (2 * wh - 1) * (2 * ww - 1)
    idx = jnp.asarray(relative_position_index(wh, ww).reshape(-1))
    onehot = (
        idx[None, :] == jnp.arange(t_rows, dtype=idx.dtype)[:, None]
    ).astype(jnp.float32)  # (T, N*N)
    gflat = g.transpose(1, 2, 0).reshape(idx.shape[0], -1)  # (N*N, heads)
    dtable = jax.lax.dot_general(
        onehot, gflat.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    return (dtable,)


gather_rel_pos_bias.defvjp(_gather_rpb_fwd, _gather_rpb_bwd)
