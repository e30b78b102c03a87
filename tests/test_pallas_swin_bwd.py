"""Round-5 Pallas attention-backward kernel (ops/pallas_swin.py
_attn_bwd_kernel + _block_bwd_manual): the hand-written vjp of the v4
fused block must match jax.vjp of the XLA reference twin for every input
and parameter, including the shifted/padded geometries.

Reference semantics: semseg/models/backbones/swin.py:81-125 (WindowMSA)
differentiated; the XLA twin (_block_reference) is the ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.ops.pallas_swin import (
    _block_bwd_manual,
    _block_reference,
    fused_window_block,
    pallas_window_attention_bwd,
    shift_region_ids,
)

ORDER = ("ln_scale", "ln_bias", "wqkv", "bqkv", "wproj", "bproj", "bias")


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("IR_ADS_PALLAS_INTERPRET", "1")


def _params(key, c, heads, ws, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    r = lambda k, *s: (  # noqa: E731
        jax.random.normal(k, s, jnp.float32) * 0.05
    ).astype(dtype)
    n = ws * ws
    return dict(
        ln_scale=(1.0 + r(ks[0], c).astype(jnp.float32)).astype(dtype),
        ln_bias=r(ks[1], c),
        wqkv=r(ks[2], c, 3 * c),
        bqkv=r(ks[3], 3 * c),
        wproj=r(ks[4], c, c),
        bproj=r(ks[5], c),
        bias=r(ks[6], heads, n, n).astype(jnp.float32),
    )


def _grads_pair(c, heads, ws, b, hp, wp, shift, h_real=None, w_real=None,
                dtype=jnp.float32):
    """(manual grads, reference-vjp grads) for one geometry."""
    key = jax.random.PRNGKey(0)
    p = _params(key, c, heads, ws, dtype)
    x = (
        jax.random.normal(jax.random.PRNGKey(1), (b, hp, wp, c), jnp.float32)
    ).astype(dtype)
    g = (
        jax.random.normal(jax.random.PRNGKey(2), (b, hp, wp, c), jnp.float32)
    ).astype(dtype)
    region = (
        jnp.asarray(shift_region_ids(hp, wp, ws, shift)) if shift else None
    )
    args = [p[k] for k in ORDER]
    scale = (c // heads) ** -0.5

    res = (x, *args, region)
    got = _block_bwd_manual(
        res, g, scale, heads, ws, h_real, w_real, shift
    )

    _, vjp = jax.vjp(
        lambda *a: _block_reference(
            *a, region, scale, heads, ws,
            h_real=h_real, w_real=w_real, shift=shift,
        ),
        x, *args,
    )
    want = vjp(g)
    return got, want


@pytest.mark.parametrize("shift", [0, 2])
def test_manual_bwd_matches_reference_vjp(shift):
    got, want = _grads_pair(
        c=32, heads=2, ws=4, b=2, hp=8, wp=12, shift=shift
    )
    names = ("dx", *["d" + k for k in ORDER])
    for nm, a, b_ in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            atol=5e-4, rtol=5e-4, err_msg=nm,
        )


@pytest.mark.slow  # pad-geometry variant; core shift parity stays fast
def test_manual_bwd_pad_geometry():
    # h_real/w_real < padded map: pad-zero masking must gate the grads too
    got, want = _grads_pair(
        c=32, heads=2, ws=4, b=2, hp=8, wp=12, shift=2,
        h_real=7, w_real=10,
    )
    names = ("dx", *["d" + k for k in ORDER])
    for nm, a, b_ in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            atol=5e-4, rtol=5e-4, err_msg=nm,
        )


@pytest.mark.slow  # p4-packing variant; core shift parity stays fast
def test_manual_bwd_p4_head_packing():
    # d=32 -> p=4 packed groups, the production head geometry
    got, want = _grads_pair(
        c=128, heads=4, ws=4, b=1, hp=8, wp=8, shift=0
    )
    names = ("dx", *["d" + k for k in ORDER])
    for nm, a, b_ in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            atol=1e-3, rtol=1e-3, err_msg=nm,
        )


def test_manual_bwd_bf16_smoke():
    got, want = _grads_pair(
        c=32, heads=2, ws=4, b=1, hp=8, wp=8, shift=2, dtype=jnp.bfloat16
    )
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            atol=5e-2, rtol=5e-2,
        )


@pytest.mark.slow  # kernel-core variant; dispatch + shift parity stay fast
def test_bwd_kernel_forward_output_matches():
    """The kernel's recomputed ow equals the forward attention output."""
    from ir_ads_tpu.ops.pallas_swin import _qkv_reference

    c, heads, ws = 32, 2, 4
    n = ws * ws
    bn = 6
    qkvw = jax.random.normal(
        jax.random.PRNGKey(3), (bn, n, 3 * c), jnp.float32
    )
    dow = jax.random.normal(jax.random.PRNGKey(4), (bn, n, c), jnp.float32)
    bias = (
        jax.random.normal(jax.random.PRNGKey(5), (heads, n, n), jnp.float32)
        * 0.05
    )
    scale = (c // heads) ** -0.5
    dqkv, ow, dbias = pallas_window_attention_bwd(
        qkvw, dow, bias, None, scale, heads
    )
    want_ow = _qkv_reference(qkvw, bias, None, scale, heads)
    np.testing.assert_allclose(
        np.asarray(ow), np.asarray(want_ow), atol=2e-5, rtol=1e-5
    )
    # grads vs vjp of the reference core
    _, vjp = jax.vjp(
        lambda a, b_: _qkv_reference(a, b_, None, scale, heads), qkvw, bias
    )
    want_dqkv, want_dbias = vjp(dow)
    np.testing.assert_allclose(
        np.asarray(dqkv), np.asarray(want_dqkv), atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(dbias), np.asarray(want_dbias), atol=5e-4, rtol=5e-4
    )


def test_custom_vjp_dispatch_pallas(monkeypatch):
    """fused_window_block grads via IR_ADS_ATTN_BWD=pallas == xla mode."""
    c, heads, ws = 32, 2, 4
    b, hp, wp = 1, 8, 8
    p = _params(jax.random.PRNGKey(0), c, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, hp, wp, c), jnp.float32)
    args = [p[k] for k in ORDER]
    scale = (c // heads) ** -0.5

    def loss(xx, *aa):
        y = fused_window_block(
            xx, *aa, None, scale, heads, ws, hp, wp, 0
        )
        return jnp.sum(y * y)

    grads = {}
    for mode in ("pallas", "xla"):
        monkeypatch.setenv("IR_ADS_ATTN_BWD", mode)
        grads[mode] = jax.grad(loss, argnums=tuple(range(8)))(x, *args)
    for a, b_ in zip(grads["pallas"], grads["xla"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4
        )


def test_adapter_freeze_fast_path(monkeypatch):
    """IR_ADS_ATTN_BWD_TRAINABLES=adapter: dx identical, frozen-param
    cotangents zero (optax.masked discards them under the reference's
    TRAIN_TYPE: Adapter recipe, optimizers.py:7-31)."""
    monkeypatch.setenv("IR_ADS_ATTN_BWD_TRAINABLES", "adapter")
    got, want = _grads_pair(
        c=32, heads=2, ws=4, b=1, hp=8, wp=12, shift=2
    )
    # dx still exact
    np.testing.assert_allclose(
        np.asarray(got[0], np.float32), np.asarray(want[0], np.float32),
        atol=5e-4, rtol=5e-4,
    )
    # every attention-parameter cotangent is exactly zero
    for a in got[1:]:
        assert float(jnp.max(jnp.abs(a))) == 0.0
