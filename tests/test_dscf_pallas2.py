"""DAttentionMM attn_impl='pallas2' (Pallas rpe-builder + fused attention)
must match the XLA einsum path bit-for-tolerance on the same parameters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ir_ads_tpu.ops.pallas_dscf as pallas_dscf
import ir_ads_tpu.ops.pallas_dscf_rpe as pallas_rpe
from ir_ads_tpu.models.backbones.swin import DAttentionMM


def _interp(monkeypatch):
    orig_attn = pallas_dscf.pallas_dscf_attention
    monkeypatch.setattr(
        pallas_dscf,
        "pallas_dscf_attention",
        lambda *a, **kw: orig_attn(*a, **{**kw, "interpret": True}),
    )
    orig_rpe = pallas_rpe.dscf_rpe_bias_pallas
    monkeypatch.setattr(
        pallas_rpe,
        "dscf_rpe_bias_pallas",
        lambda *a, **kw: orig_rpe(*a, **{**kw, "interpret": True}),
    )


@pytest.mark.slow
def test_dattention_pallas2_matches_xla(monkeypatch):
    _interp(monkeypatch)
    b, h, w, c = 2, 16, 16, 32
    g, heads, stride = 2, 4, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    y = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    mod_xla = DAttentionMM(
        dim=c, n_heads=heads, n_groups=g, stride=stride, attn_impl="xla"
    )
    mod_p2 = DAttentionMM(
        dim=c, n_heads=heads, n_groups=g, stride=stride, attn_impl="pallas2"
    )
    variables = mod_xla.init({"params": jax.random.PRNGKey(0)}, x, y)
    out_xla = mod_xla.apply(variables, x, y, False)
    out_p2 = mod_p2.apply(variables, x, y, False)
    np.testing.assert_allclose(
        np.asarray(out_p2), np.asarray(out_xla), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_dattention_pallas2_gradients_finite(monkeypatch):
    _interp(monkeypatch)
    b, h, w, c = 1, 8, 8, 16
    mod = DAttentionMM(
        dim=c, n_heads=2, n_groups=1, stride=2, attn_impl="pallas2"
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    y = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, y)

    def loss(params):
        out = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, y, True,
            mutable=["batch_stats"],
        )[0]
        return jnp.sum(out**2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(leaf))) for leaf in leaves)
    # the rpe table must receive gradient through the pallas2 path
    gt = grads["rpe_table"]
    assert float(jnp.sum(jnp.abs(gt))) > 0.0
