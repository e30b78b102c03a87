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
