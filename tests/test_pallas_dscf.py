"""Fused DSCF attention kernel vs its XLA twin (detrex test pattern:
kernel vs independently-written reference + gradients). Interpreter mode on
CPU; the same code path compiles on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.ops import pallas_dscf
from ir_ads_tpu.ops.pallas_dscf import (
    NEG_INF,
    dscf_attention,
    dscf_reference,
    pallas_dscf_attention,
)


def _data(seed=0, bg=4, hw=100, m=24, mp=128, hg=2, hc=8):
    rng = np.random.RandomState(seed)
    gc = hg * hc
    q = jnp.asarray(rng.randn(bg, hw, gc).astype(np.float32))
    k = jnp.asarray(
        np.pad(rng.randn(bg, m, gc), ((0, 0), (0, mp - m), (0, 0))).astype(
            np.float32
        )
    )
    v = jnp.asarray(
        np.pad(rng.randn(bg, m, gc), ((0, 0), (0, mp - m), (0, 0))).astype(
            np.float32
        )
    )
    bias = np.random.RandomState(seed + 1).randn(bg, hw, hg, mp)
    bias[:, :, :, m:] = NEG_INF  # padded key columns masked
    bias = jnp.asarray(bias.reshape(bg, hw, hg * mp).astype(np.float32))
    return q, k, v, bias


def test_kernel_matches_reference():
    q, k, v, bias = _data()
    ref = dscf_reference(q, k, v, bias, 0.35, 2)
    out = pallas_dscf_attention(q, k, v, bias, 0.35, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_query_tiling_and_padding():
    # hw not a multiple of the tile -> padded rows must be sliced away
    q, k, v, bias = _data(seed=3, hw=37)
    ref = dscf_reference(q, k, v, bias, 0.5, 2)
    out = pallas_dscf_attention(
        q, k, v, bias, 0.5, 2, query_tile=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_vjp_matches_reference_grads(monkeypatch):
    orig = pallas_dscf.pallas_dscf_attention
    monkeypatch.setattr(
        pallas_dscf,
        "pallas_dscf_attention",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    q, k, v, bias = _data(seed=5, bg=2, hw=20)

    def loss_fused(q, k, v, bias):
        return jnp.sum(dscf_attention(q, k, v, bias, 0.35, 2) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(dscf_reference(q, k, v, bias, 0.35, 2) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow  # 39 s of CPU compiles; kernel-level dscf tests stay fast
def test_module_pallas_path_matches_xla_path():
    """DAttentionMM end-to-end: packed-kernel path == einsum path."""
    from ir_ads_tpu.models.backbones.swin import DAttentionMM
    from ir_ads_tpu.ops import pallas_dscf as pd

    # run the pallas branch in interpreter mode on CPU
    orig = pd.pallas_dscf_attention
    try:
        pd.pallas_dscf_attention = lambda *a, **kw: orig(
            *a, **{**kw, "interpret": True}
        )
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 24, 32, 16), jnp.float32)
        y = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 32, 16), jnp.float32)
        kw = dict(dim=16, n_heads=2, n_groups=1, stride=8, level=0)
        mx = DAttentionMM(attn_impl="xla", **kw)
        mp_ = DAttentionMM(attn_impl="pallas", **kw)
        variables = mx.init({"params": key}, x, y)
        a = mx.apply(variables, x, y)
        b = mp_.apply(variables, x, y)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )
    finally:
        pd.pallas_dscf_attention = orig


@pytest.mark.slow  # ~18 s: two-kernel-path A/B; kernel parity + vjp stay fast
def test_fused_builder_attention_matches_two_kernel_path():
    """dscf_attention_fused == rows builder + rows attention (same rounding:
    bias built with bf16 operands, rounded to the store dtype)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ir_ads_tpu.ops.pallas_dscf import (
        dscf_fused_reference,
        pallas_dscf_attention_fused,
    )

    bg, h, w, gc, hg = 2, 8, 16, 16, 2
    m = 24
    s1, s2 = 15, 19
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    q = jax.random.normal(ks[0], (bg, h * w, gc), jnp.float32)
    k = jax.random.normal(ks[1], (bg, m, gc), jnp.float32)
    v = jax.random.normal(ks[2], (bg, m, gc), jnp.float32)
    pos = jax.random.uniform(ks[3], (bg, m, 2), jnp.float32, -1.0, 1.0)
    table = jax.random.normal(ks[4], (2, hg, s1, s2), jnp.float32) * 0.1
    scale = (gc // hg) ** -0.5

    out = pallas_dscf_attention_fused(
        q, k, v, pos, table, h, w, scale, hg, store_dtype=jnp.float32,
        interpret=True,
    )
    ref = dscf_fused_reference(
        q, k, v, pos, table, h, w, scale, hg, store_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
