"""w8a8 int8 matmul path (ops/int8.py): numeric budget + param-tree
compatibility + whole-model parity budget measurement."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ir_ads_tpu.ops.int8 import (
    QuantConv,
    QuantDense,
    quantized_conv,
    quantized_matmul,
)


def test_quant_conv_param_tree_and_float_path_match_nn_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, 11, 16).astype(np.float32))
    v_q = QuantConv(8, (3, 3), padding=1).init(jax.random.PRNGKey(0), x)
    m_d = nn.Conv(8, (3, 3), padding=1)
    v_d = m_d.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_q) == jax.tree_util.tree_structure(
        v_d
    )
    y_q = QuantConv(8, (3, 3), padding=1, quant=False).apply(v_d, x)
    y_d = m_d.apply(v_d, x)
    np.testing.assert_allclose(
        np.asarray(y_q), np.asarray(y_d), rtol=1e-5, atol=1e-5
    )
    # 3-D (B, M, C) input, 1x1 kernel — the DSCF proj_k/v call shape
    x3 = jnp.asarray(rng.randn(2, 7, 16).astype(np.float32))
    m1 = nn.Conv(8, (1, 1))
    v1 = m1.init(jax.random.PRNGKey(0), x3)
    y_q3 = QuantConv(8, (1, 1), quant=False).apply(v1, x3)
    np.testing.assert_allclose(
        np.asarray(y_q3), np.asarray(m1.apply(v1, x3)), rtol=1e-5, atol=1e-5
    )


def test_quant_conv_int8_close_to_float():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 9, 11, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 8).astype(np.float32) * 0.05)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = quantized_conv(x, w, 1)
    err = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(
        np.asarray(want)
    )
    assert err < 0.03, err


def test_quantized_matmul_close_to_float():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 96).astype(np.float32) * 0.05)
    want = x @ w
    got = quantized_matmul(x, w)
    err = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(
        np.asarray(want)
    )
    assert err < 0.02, err  # ~1% relative error for w8a8 dynamic quant


def test_quant_dense_param_tree_matches_nn_dense():
    x = jnp.zeros((2, 16))
    v_q = QuantDense(8).init(jax.random.PRNGKey(0), x)
    v_d = nn.Dense(8).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_q) == jax.tree_util.tree_structure(
        v_d
    )
    # float path with identical params == nn.Dense exactly
    y_q = QuantDense(8, quant=False).apply(v_d, x + 1.0)
    y_d = nn.Dense(8).apply(v_d, x + 1.0)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_d), rtol=1e-6)


@pytest.mark.slow
def test_whole_model_int8_parity_budget():
    """Measure the w8a8-vs-float parity budget on the tiny CMNeXt: pixel
    argmax agreement must be high (the ±0.1-mIoU argument) and the param
    tree identical so one checkpoint serves both modes."""
    from ir_ads_tpu.models.cmnext import CMNeXt

    kwargs = dict(
        backbone="SwinTransformer-B", num_classes=9,
        backbone_kwargs=dict(
            embed_dim=16, depths=(1, 2, 1, 1), num_heads=(1, 2, 4, 8),
            window_size=4, drop_path_rate=0.0,
        ),
        head_dims=(32, 16), mmst_mask=False,
    )
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    dte = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))

    model = CMNeXt(**kwargs)
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    y_f = model.apply(variables, rgb, dte, train=False)[0]

    os.environ["IR_ADS_INT8"] = "1"
    try:
        model_q = CMNeXt(**kwargs)
        y_q = model_q.apply(variables, rgb, dte, train=False)[0]
    finally:
        os.environ.pop("IR_ADS_INT8", None)

    pf = np.asarray(jnp.argmax(y_f, -1))
    pq = np.asarray(jnp.argmax(y_q, -1))
    agreement = (pf == pq).mean()
    rel = np.linalg.norm(np.asarray(y_q - y_f)) / np.linalg.norm(
        np.asarray(y_f)
    )
    assert agreement > 0.95, agreement
    assert rel < 0.15, rel
