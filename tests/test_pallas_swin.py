"""Pallas fused window-attention kernel vs the XLA reference
(detrex pattern: kernel vs independently-written implementation + grads).

Runs in interpreter mode on CPU; the same code path compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.ops import pallas_swin
from ir_ads_tpu.ops.pallas_swin import (
    fused_window_attention,
    pallas_window_attention,
    shift_region_ids,
)
from ir_ads_tpu.ops.window_attention import shift_window_mask, window_attention


def _data(seed=0, ws=4, heads=2, d=8, hp=8, wp=12, b=3):
    rng = np.random.RandomState(seed)
    n = ws * ws
    nw = (hp // ws) * (wp // ws)
    bn = b * nw
    q = jnp.asarray(rng.randn(bn, heads, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(bn, heads, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(bn, heads, n, d).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32))
    return q, k, v, bias, (hp, wp, ws)


def test_pallas_matches_xla_shifted(monkeypatch):
    q, k, v, bias, (hp, wp, ws) = _data()
    shift = ws // 2
    mask = jnp.asarray(shift_window_mask(hp, wp, ws, shift))
    region = jnp.asarray(shift_region_ids(hp, wp, ws, shift))
    ref = window_attention(q, k, v, bias, mask, 0.25)
    out = pallas_window_attention(q, k, v, bias, region, 0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_matches_xla_noshift():
    q, k, v, bias, _ = _data(seed=1)
    ref = window_attention(q, k, v, bias, None, 0.25)
    out = pallas_window_attention(q, k, v, bias, None, 0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_vjp_matches_xla_grads(monkeypatch):
    # force the interpretable kernel inside the custom_vjp forward
    orig = pallas_swin.pallas_window_attention
    monkeypatch.setattr(
        pallas_swin,
        "pallas_window_attention",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    q, k, v, bias, (hp, wp, ws) = _data(seed=2)
    shift = ws // 2
    mask = jnp.asarray(shift_window_mask(hp, wp, ws, shift))
    region = jnp.asarray(shift_region_ids(hp, wp, ws, shift))

    def loss_fused(q, k, v, bias):
        return jnp.sum(fused_window_attention(q, k, v, bias, region, 0.25) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(window_attention(q, k, v, bias, mask, 0.25) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_qkv_kernel_matches_reference_shifted():
    rng = np.random.RandomState(3)
    ws, heads, d, hp, wp, b = 4, 2, 8, 8, 12, 3
    n = ws * ws
    c = heads * d
    nw = (hp // ws) * (wp // ws)
    qkv = jnp.asarray(rng.randn(b * nw, n, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32))
    region = jnp.asarray(shift_region_ids(hp, wp, ws, ws // 2))
    ref = pallas_swin._qkv_reference(qkv, bias, region, 0.25, heads)
    out = pallas_swin.pallas_window_attention_qkv(
        qkv, bias, region, 0.25, heads, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_qkv_kernel_matches_reference_noshift():
    rng = np.random.RandomState(4)
    heads, d, n = 3, 8, 16
    c = heads * d
    qkv = jnp.asarray(rng.randn(10, n, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32))
    ref = pallas_swin._qkv_reference(qkv, bias, None, 0.25, heads)
    out = pallas_swin.pallas_window_attention_qkv(
        qkv, bias, None, 0.25, heads, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_qkv_fused_vjp_matches_reference_grads(monkeypatch):
    orig = pallas_swin.pallas_window_attention_qkv
    monkeypatch.setattr(
        pallas_swin,
        "pallas_window_attention_qkv",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    rng = np.random.RandomState(5)
    ws, heads, d, hp, wp, b = 4, 2, 8, 8, 12, 2
    n = ws * ws
    c = heads * d
    nw = (hp // ws) * (wp // ws)
    qkv = jnp.asarray(rng.randn(b * nw, n, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32))
    region = jnp.asarray(shift_region_ids(hp, wp, ws, ws // 2))

    def loss_fused(qkv, bias):
        return jnp.sum(
            pallas_swin.fused_window_attention_qkv(qkv, bias, region, 0.25, heads)
            ** 2
        )

    def loss_ref(qkv, bias):
        return jnp.sum(
            pallas_swin._qkv_reference(qkv, bias, region, 0.25, heads) ** 2
        )

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_region_ids_equivalent_to_dense_mask():
    hp, wp, ws, shift = 24, 36, 12, 6
    region = shift_region_ids(hp, wp, ws, shift)
    mask = shift_window_mask(hp, wp, ws, shift)
    dense_from_region = np.where(
        region[:, :, None] != region[:, None, :], -100.0, 0.0
    )
    np.testing.assert_array_equal(dense_from_region, mask)


def test_v3_map_kernel_matches_reference():
    """fused_window_attention_map (interpret) == partition->v2-ref->reverse."""
    rng = np.random.RandomState(7)
    b, hp, wp, ws, c, heads = 2, 8, 12, 4, 16, 2
    n = ws * ws
    qkv = jnp.asarray(rng.randn(b, hp, wp, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32))
    for region in (None, jnp.asarray(shift_region_ids(hp, wp, ws, ws // 2))):
        want = pallas_swin._map_reference(qkv, bias, region, 0.25, heads, ws)
        got = pallas_swin.pallas_window_attention_map(
            qkv, bias, region, 0.25, heads, ws, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )


def test_v3_map_kernel_row_banded_matches():
    """rows_per_step < nWh must give identical results."""
    rng = np.random.RandomState(8)
    b, hp, wp, ws, c, heads = 1, 12, 8, 4, 8, 2
    n = ws * ws
    qkv = jnp.asarray(rng.randn(b, hp, wp, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32))
    region = jnp.asarray(shift_region_ids(hp, wp, ws, ws // 2))
    want = pallas_swin._map_reference(qkv, bias, region, 0.5, heads, ws)
    got = pallas_swin.pallas_window_attention_map(
        qkv, bias, region, 0.5, heads, ws, rows_per_step=1, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_v3_map_gradients_match_reference(monkeypatch):
    orig = pallas_swin.pallas_window_attention_map
    monkeypatch.setattr(
        pallas_swin,
        "pallas_window_attention_map",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    rng = np.random.RandomState(9)
    b, hp, wp, ws, c, heads = 1, 8, 8, 4, 8, 2
    n = ws * ws
    qkv = jnp.asarray(rng.randn(b, hp, wp, 3 * c).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32))
    region = jnp.asarray(shift_region_ids(hp, wp, ws, ws // 2))

    def loss_fused(qkv, bias):
        return jnp.sum(
            pallas_swin.fused_window_attention_map(
                qkv, bias, region, 0.25, heads, ws
            )
            ** 2
        )

    def loss_ref(qkv, bias):
        return jnp.sum(
            pallas_swin._map_reference(qkv, bias, region, 0.25, heads, ws) ** 2
        )

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)
