"""Fused Swin block tail (LN + FFN + adapter, ops/pallas_mlp.py):
kernel == XLA reference == the unfused module path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.ops.pallas_mlp import (
    block_tail_reference,
    fused_block_tail_pallas,
)


def _params(key, c, hidden, ca, dtype=jnp.float32):
    ks = jax.random.split(key, 11)
    r = lambda k, *s: (jax.random.normal(k, s, dtype) * 0.05)  # noqa: E731
    return dict(
        ln_scale=1.0 + r(ks[0], c),
        ln_bias=r(ks[1], c),
        w1=r(ks[2], c, hidden),
        b1=r(ks[3], hidden),
        w2=r(ks[4], hidden, c),
        b2=r(ks[5], c),
        aw1=r(ks[6], c, ca),
        ab1=r(ks[7], ca),
        aw2=r(ks[8], ca, c),
        ab2=r(ks[9], c),
    )


@pytest.mark.parametrize("n,c,hidden,ca", [(96, 128, 512, 8), (130, 64, 256, 4)])
def test_kernel_matches_reference(n, c, hidden, ca):
    key = jax.random.PRNGKey(0)
    p = _params(key, c, hidden, ca)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, c), jnp.float32)
    got = fused_block_tail_pallas(x, *p.values(), interpret=True)
    want = block_tail_reference(x, *p.values())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_fused_path_matches_module_path():
    """SwinBlockAdapter with IR_ADS_FFN=fused (interpret) == xla path,
    same params."""
    from ir_ads_tpu.models.backbones.swin import SwinBlockAdapter

    blk = SwinBlockAdapter(
        dim=64, num_heads=4, ffn_dim=256, window_size=4, shift=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 64), jnp.float32)
    old_ffn = os.environ.get("IR_ADS_FFN")
    old_interp = os.environ.get("IR_ADS_PALLAS_INTERPRET")
    try:
        os.environ["IR_ADS_FFN"] = "fused"
        os.environ["IR_ADS_PALLAS_INTERPRET"] = "1"
        v = blk.init({"params": jax.random.PRNGKey(3)}, x, "rgb", True)
        out_fused = blk.apply(v, x, "rgb", True)
        os.environ["IR_ADS_FFN"] = "xla"
        out_xla = blk.apply(v, x, "rgb", True)
    finally:
        for k, old in (
            ("IR_ADS_FFN", old_ffn),
            ("IR_ADS_PALLAS_INTERPRET", old_interp),
        ):
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), atol=2e-5, rtol=1e-5
    )


def test_param_tree_identical_between_paths():
    from ir_ads_tpu.models.backbones.swin import SwinBlockAdapter

    blk = SwinBlockAdapter(
        dim=32, num_heads=2, ffn_dim=128, window_size=4, shift=False,
    )
    x = jnp.zeros((2, 4, 4, 32), jnp.float32)
    old = os.environ.get("IR_ADS_FFN")
    try:
        os.environ["IR_ADS_FFN"] = "xla"
        v_xla = blk.init({"params": jax.random.PRNGKey(0)}, x, "dte", True)
        os.environ["IR_ADS_FFN"] = "fused"
        os.environ["IR_ADS_PALLAS_INTERPRET"] = "1"
        v_fused = blk.init({"params": jax.random.PRNGKey(0)}, x, "dte", True)
    finally:
        if old is None:
            os.environ.pop("IR_ADS_FFN", None)
        else:
            os.environ["IR_ADS_FFN"] = old
        os.environ.pop("IR_ADS_PALLAS_INTERPRET", None)
    t1 = jax.tree_util.tree_structure(v_xla)
    t2 = jax.tree_util.tree_structure(v_fused)
    assert t1 == t2
    key = lambda pa: jax.tree_util.keystr(pa[0])  # noqa: E731
    for (p1, a1), (p2, a2) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(v_xla["params"]), key=key),
        sorted(
            jax.tree_util.tree_leaves_with_path(v_fused["params"]), key=key
        ),
    ):
        assert p1 == p2
        assert a1.shape == a2.shape
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_gradients_flow_through_custom_vjp():
    from ir_ads_tpu.ops.pallas_mlp import fused_block_tail

    os.environ["IR_ADS_PALLAS_INTERPRET"] = "1"
    try:
        key = jax.random.PRNGKey(4)
        p = _params(key, 32, 128, 2)
        x = jax.random.normal(jax.random.PRNGKey(5), (40, 32), jnp.float32)

        # NB: unpack by name — jax rebuilds dict pytrees in sorted-key
        # order under grad, so *p.values() would scramble the args.
        order = (
            "ln_scale", "ln_bias", "w1", "b1", "w2", "b2",
            "aw1", "ab1", "aw2", "ab2",
        )

        def loss_fused(x, p):
            return jnp.sum(fused_block_tail(x, *(p[k] for k in order)) ** 2)

        def loss_ref(x, p):
            return jnp.sum(
                block_tail_reference(x, *(p[k] for k in order)) ** 2
            )

        gx1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(x, p)
        gx2, gp2 = jax.grad(loss_ref, argnums=(0, 1))(x, p)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
        for k in gp1:
            np.testing.assert_allclose(
                np.asarray(gp1[k]), np.asarray(gp2[k]), atol=1e-4,
                err_msg=k,
            )
    finally:
        os.environ.pop("IR_ADS_PALLAS_INTERPRET", None)
