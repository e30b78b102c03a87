"""v5 whole-map fused half-block (ops/pallas_swin.pallas_window_block_full):
kernel == XLA twin == the v4 path on real maps, including pad + shift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.ops.pallas_swin import (
    _block_full_reference,
    pallas_window_block_full,
    shift_region_ids,
)


def _params(key, c, heads, ws):
    ks = jax.random.split(key, 8)
    r = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.05  # noqa
    n = ws * ws
    return [
        1.0 + r(ks[0], c), r(ks[1], c),
        r(ks[2], c, 3 * c), r(ks[3], 3 * c),
        r(ks[4], c, c), r(ks[5], c),
        r(ks[6], heads, n, n),
    ]


@pytest.mark.parametrize(
    "h,w,shift,heads,c",
    [
        (8, 8, 0, 2, 32),     # aligned, no shift
        (8, 8, 2, 2, 32),     # aligned, shifted
        (7, 6, 2, 2, 32),     # pad + shift
        (8, 8, 2, 4, 128),    # packed-head path (d=32, p=4)
        (7, 10, 2, 8, 256),   # pad + shift + 2 packed groups
    ],
)
def test_v5_matches_reference(h, w, shift, heads, c):
    ws = 4
    args = _params(jax.random.PRNGKey(3), c, heads, ws)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, h, w, c), jnp.float32)
    hp, wp = -(-h // ws) * ws, -(-w // ws) * ws
    region = (
        jnp.asarray(shift_region_ids(hp, wp, ws, shift)) if shift else None
    )
    scale = (c // heads) ** -0.5
    out = pallas_window_block_full(
        x, *args, region, scale, heads, ws, shift=shift, interpret=True
    )
    ref = _block_full_reference(x, *args, region, scale, heads, ws, shift=shift)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_v5_module_path_equivalence():
    """pallas5 through SwinBlockAdapter == the xla module path."""
    import os

    from ir_ads_tpu.models.backbones.swin import SwinBlockAdapter

    block = SwinBlockAdapter(
        dim=32, num_heads=2, ffn_dim=64, window_size=4, shift=True,
        dtype=None,
    )
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 7, 6, 32), jnp.float32)
    v = block.init(
        {"params": jax.random.PRNGKey(0)}, x, "rgb", True
    )
    os.environ["IR_ADS_PALLAS_INTERPRET"] = "1"
    os.environ["IR_ADS_FFN"] = "xla"
    try:
        ref = block.apply(v, x, "rgb", True, method=None)
        os.environ["IR_ADS_SWIN_ATTN"] = "pallas5"
        out = block.apply(v, x, "rgb", True)
    finally:
        os.environ.pop("IR_ADS_SWIN_ATTN", None)
        os.environ.pop("IR_ADS_PALLAS_INTERPRET", None)
        os.environ.pop("IR_ADS_FFN", None)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def _tail_params_v6(key, c, hidden, ca):
    ks = jax.random.split(key, 10)
    r = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.05  # noqa
    return (
        1.0 + r(ks[0], c), r(ks[1], c),
        r(ks[2], c, hidden), r(ks[3], hidden),
        r(ks[4], hidden, c), r(ks[5], c),
        r(ks[6], c, ca), r(ks[7], ca),
        r(ks[8], ca, c), r(ks[9], c),
    )


@pytest.mark.parametrize("h,w,shift", [(8, 8, 0), (7, 6, 2)])
def test_v6_matches_reference(h, w, shift):
    from ir_ads_tpu.ops.pallas_swin import (
        _block_v6_reference,
        pallas_window_block_v6,
    )

    ws, c, heads = 4, 32, 2
    attn = tuple(_params(jax.random.PRNGKey(8), c, heads, ws))
    tail = _tail_params_v6(jax.random.PRNGKey(9), c, 64, 4)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, h, w, c), jnp.float32)
    hp, wp = -(-h // ws) * ws, -(-w // ws) * ws
    region = (
        jnp.asarray(shift_region_ids(hp, wp, ws, shift)) if shift else None
    )
    scale = (c // heads) ** -0.5
    out = pallas_window_block_v6(
        x, attn, tail, region, scale, heads, ws, shift=shift, interpret=True
    )
    ref = _block_v6_reference(x, attn, tail, region, scale, heads, ws,
                              shift=shift)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("sub_mode,batch", [("rgb", 2), ("dual", 4)])
def test_v6_module_path_equivalence(sub_mode, batch):
    import os

    from ir_ads_tpu.models.backbones.swin import SwinBlockAdapter

    block = SwinBlockAdapter(
        dim=32, num_heads=2, ffn_dim=64, window_size=4, shift=True,
        dtype=None,
    )
    x = jax.random.normal(
        jax.random.PRNGKey(7), (batch, 7, 6, 32), jnp.float32
    )
    v = block.init({"params": jax.random.PRNGKey(0)}, x, sub_mode, True)
    os.environ["IR_ADS_PALLAS_INTERPRET"] = "1"
    os.environ["IR_ADS_FFN"] = "xla"
    try:
        ref = block.apply(v, x, sub_mode, True)
        os.environ["IR_ADS_SWIN_ATTN"] = "pallas6"
        out = block.apply(v, x, sub_mode, True)
    finally:
        os.environ.pop("IR_ADS_SWIN_ATTN", None)
        os.environ.pop("IR_ADS_PALLAS_INTERPRET", None)
        os.environ.pop("IR_ADS_FFN", None)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_v5_v6_biasmask_typed_bitwise(monkeypatch):
    """IR_ADS_SWIN_BIASMASK=3 in the whole-map kernels (v5/v6): the
    per-window-row slab + shared column mask reproduce the in-kernel
    region compare bitwise (masked logits underflow to exact 0 in exp
    either way).  Pad + shift geometry with packed heads."""
    from ir_ads_tpu.ops.pallas_swin import pallas_window_block_v6

    rng = np.random.RandomState(2)
    b, h, w, c, heads, ws, shift = 2, 14, 18, 128, 4, 4, 2
    hp, wp = 16, 20
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    attn = tuple(_params(jax.random.PRNGKey(11), c, heads, ws))
    tail = _tail_params_v6(jax.random.PRNGKey(12), c, 4 * c, 16)
    region = jnp.asarray(shift_region_ids(hp, wp, ws, shift))
    scale = (c // heads) ** -0.5

    monkeypatch.setenv("IR_ADS_SWIN_BIASMASK", "0")
    b5 = pallas_window_block_full(
        x, *attn, region, scale, heads, ws, shift=shift, interpret=True
    )
    b6 = pallas_window_block_v6(
        x, attn, tail, region, scale, heads, ws, shift=shift,
        interpret=True,
    )
    monkeypatch.setenv("IR_ADS_SWIN_BIASMASK", "3")
    g5 = pallas_window_block_full(
        x, *attn, region, scale, heads, ws, shift=shift, interpret=True
    )
    g6 = pallas_window_block_v6(
        x, attn, tail, region, scale, heads, ws, shift=shift,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(g5), np.asarray(b5))
    np.testing.assert_array_equal(np.asarray(g6), np.asarray(b6))
