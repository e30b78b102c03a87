"""w8a8 variants of the fused kernels (ops/pallas_mlp._tail_kernel_int8,
ops/pallas_swin._attn_kernel_v4_int8): kernel == hand-computed w8a8 twin,
and close to the float path (dynamic per-row activation quant is exact to
factor out of the dot, so the only error is int8 rounding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.ops.pallas_mlp import (
    block_tail_reference,
    fused_block_tail_pallas,
    quantize_weight,
)


def _w8a8_matmul_ref(x, w):
    """Same math as the in-kernel dots: per-row activation scale, per-col
    weight scale, s32 accumulation."""
    wq, sw = quantize_weight(w)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)
    out = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return out.astype(jnp.float32) * sx * sw


def _tail_int8_twin(x, ln_s, ln_b, w1, b1, w2, b2, aw1, ab1, aw2, ab2,
                    eps=1e-5, adapter_scale=0.5):
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)
    xn = xn.astype(cdt).astype(jnp.float32)
    h = _w8a8_matmul_ref(xn, w1) + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    ffn = _w8a8_matmul_ref(h, w2) + b2.astype(jnp.float32)
    a = (
        jnp.dot(x, aw1.astype(cdt), preferred_element_type=jnp.float32)
        + ab1.astype(jnp.float32)
    )
    a = jnp.maximum(a, 0.0).astype(cdt)
    a = (
        jnp.dot(a, aw2.astype(cdt), preferred_element_type=jnp.float32)
        + ab2.astype(jnp.float32)
    )
    return (xf + ffn + adapter_scale * a).astype(cdt)


def _tail_params(key, c, hidden, ca):
    ks = jax.random.split(key, 12)
    r = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.05  # noqa
    return dict(
        ln_scale=1.0 + r(ks[0], c), ln_bias=r(ks[1], c),
        w1=r(ks[2], c, hidden), b1=r(ks[3], hidden),
        w2=r(ks[4], hidden, c), b2=r(ks[5], c),
        aw1=r(ks[6], c, ca), ab1=r(ks[7], ca),
        aw2=r(ks[8], ca, c), ab2=r(ks[9], c),
    )


ORDER = ("ln_scale", "ln_bias", "w1", "b1", "w2", "b2",
         "aw1", "ab1", "aw2", "ab2")


def test_tail_int8_matches_twin(monkeypatch):
    monkeypatch.setenv("IR_ADS_INT8", "1")
    c, hidden, ca = 64, 128, 8
    p = _tail_params(jax.random.PRNGKey(0), c, hidden, ca)
    x = jax.random.normal(jax.random.PRNGKey(1), (48, c), jnp.float32)
    args = [p[k] for k in ORDER]
    out = fused_block_tail_pallas(x, *args, interpret=True)
    twin = _tail_int8_twin(x, *args)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(twin), rtol=2e-5, atol=2e-5
    )
    # and close to the float tail: int8 rounding only
    ref = block_tail_reference(x, *args)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() < 0.02 * scale, (err.mean(), scale)


@pytest.mark.parametrize("heads,c", [(4, 128)])
def test_v4_int8_close_to_float(heads, c, monkeypatch):
    from ir_ads_tpu.ops.pallas_swin import (
        _block_reference,
        pallas_window_block,
        shift_region_ids,
    )

    ws = 4
    n = ws * ws
    ks = jax.random.split(jax.random.PRNGKey(5), 8)
    r = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.05  # noqa
    args = [
        1.0 + r(ks[0], c), r(ks[1], c),
        r(ks[2], c, 3 * c), r(ks[3], 3 * c),
        r(ks[4], c, c), r(ks[5], c),
        r(ks[6], heads, n, n),
    ]
    x = jax.random.normal(ks[7], (2, 8, 8, c), jnp.float32)
    region = jnp.asarray(shift_region_ids(8, 8, ws, 2))
    scale = (c // heads) ** -0.5

    monkeypatch.setenv("IR_ADS_INT8", "1")
    out = pallas_window_block(
        x, *args, region, scale, heads, ws, shift=2, interpret=True
    )
    monkeypatch.delenv("IR_ADS_INT8")
    ref = _block_reference(x, *args, region, scale, heads, ws, shift=2)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    ref_scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() < 0.02 * ref_scale, (err.mean(), ref_scale)
