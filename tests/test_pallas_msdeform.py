"""Pallas multi-scale deformable-sampling kernel vs the XLA-gather
reference (detection/msdeform_attn.ms_deform_attn, itself torch-parity +
gradient tested in tests/test_msdeform.py) — the detrex kernel-test
pattern (reference tests/test_ms_deform_attn.py:41-80) applied to the
round-4 dynamic-gather kernel (ops/pallas_msdeform.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.detection.msdeform_attn import ms_deform_attn
from ir_ads_tpu.ops.pallas_msdeform import ms_deform_attn_pallas


def _data(seed, shapes, bs, heads, d, lq, points, oob=True):
    rng = np.random.RandomState(seed)
    n_value = sum(h * w for h, w in shapes)
    value = rng.randn(bs, n_value, heads, d).astype(np.float32)
    span = 1.2 if oob else 1.0
    off = -0.1 if oob else 0.0
    locations = (
        rng.rand(bs, lq, heads, len(shapes), points, 2).astype(np.float32)
        * span
        + off
    )
    weights = rng.rand(bs, lq, heads, len(shapes), points).astype(np.float32)
    weights /= weights.reshape(bs, lq, heads, -1).sum(-1)[..., None, None]
    return (
        jnp.asarray(value),
        shapes,
        jnp.asarray(locations),
        jnp.asarray(weights),
    )


@pytest.mark.parametrize(
    "shapes,bs,heads,d,lq,points",
    [
        (((12, 16), (6, 8), (3, 4)), 2, 4, 8, 37, 3),
        # DINO-like: 4 levels, 8 heads, D=32, P=4 (scaled down)
        (((16, 20), (8, 10), (4, 5), (2, 3)), 1, 8, 32, 100, 4),
    ],
)
def test_pallas_msdeform_matches_xla(shapes, bs, heads, d, lq, points):
    value, shapes, loc, w = _data(0, shapes, bs, heads, d, lq, points)
    ref = ms_deform_attn(value, shapes, loc, w)
    out = ms_deform_attn_pallas(value, shapes, loc, w, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow  # the Pallas msdeform kernel is opt-in (dead on the
# relay toolchain); one matches_xla case stays fast as the smoke check
def test_pallas_msdeform_grads_match_xla():
    value, shapes, loc, w = _data(1, ((8, 8), (4, 4), (2, 2)), 1, 4, 8, 50, 4)

    def loss(f):
        return lambda v, l, ww: jnp.sum(f(v, l, ww) ** 2)

    g_ref = jax.grad(
        loss(lambda v, l, ww: ms_deform_attn(v, shapes, l, ww)),
        argnums=(0, 1, 2),
    )(value, loc, w)
    g_ker = jax.grad(
        loss(lambda v, l, ww: ms_deform_attn_pallas(v, shapes, l, ww, True)),
        argnums=(0, 1, 2),
    )(value, loc, w)
    for a, b, name in zip(g_ref, g_ker, ("value", "locations", "weights")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5, err_msg=name
        )


@pytest.mark.slow
def test_pallas_msdeform_chunked_f32_path(monkeypatch):
    """Force f32_chunks > 1 (the big-shape VMEM-bounding path)."""
    monkeypatch.setenv("IR_ADS_MSDEFORM_CHUNKS", "2")
    value, shapes, loc, w = _data(3, ((8, 8), (4, 4), (2, 2)), 1, 4, 8, 40, 4)
    ref = ms_deform_attn(value, shapes, loc, w)
    out = ms_deform_attn_pallas(value, shapes, loc, w, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_pallas_msdeform_bf16_and_query_padding():
    """bf16 values + a query count that does not divide the tile size."""
    value, shapes, loc, w = _data(
        2, ((10, 12), (5, 6), (2, 3)), 2, 8, 16, 203, 4, oob=False
    )
    vb = value.astype(jnp.bfloat16)
    ref = ms_deform_attn(vb, shapes, loc, w.astype(jnp.bfloat16))
    out = ms_deform_attn_pallas(vb, shapes, loc, w.astype(jnp.bfloat16), True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref, np.float32),
        rtol=0.05,
        atol=0.05,
    )
