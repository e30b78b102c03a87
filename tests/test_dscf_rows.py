"""pallas3 DSCF path (rows-layout rpe builder + rows attention kernel).

The round-2 finding driving this path: the rpe builder kernel's natural
(BG, hg, h, M, w) output must be consumed without any HBM relayout, so the
attention kernel computes scores TRANSPOSED (key-major).  These tests pin

  1. the rows rpe builder kernel against its XLA twin,
  2. the rows attention kernel against its XLA twin,
  3. the full DAttentionMM attn_impl='pallas3' against the XLA einsum path,
  4. gradient flow through both custom_vjp wrappers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ir_ads_tpu.ops.pallas_dscf as pallas_dscf
import ir_ads_tpu.ops.pallas_dscf_rpe as pallas_rpe
from ir_ads_tpu.models.backbones.swin import DAttentionMM
from ir_ads_tpu.ops.pallas_dscf import (
    dscf_rows_reference,
    pallas_dscf_attention_rows,
)
from ir_ads_tpu.ops.pallas_dscf_rpe import (
    dscf_rpe_bias_rows_pallas,
    dscf_rpe_bias_rows_reference,
)


@pytest.mark.parametrize("h,w,g,hg", [(16, 16, 1, 2), (12, 16, 2, 2)])
def test_rpe_rows_kernel_matches_reference(h, w, g, hg):
    b, m = 2, 8
    s1, s2 = 23, 31
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pos = jax.random.uniform(k1, (b * g, m, 2), jnp.float32, -1.0, 1.0)
    table = jax.random.normal(k2, (g, hg, s1, s2), jnp.float32)

    want = dscf_rpe_bias_rows_reference(pos, table, h, w, out_dtype=jnp.float32)
    got = dscf_rpe_bias_rows_pallas(
        pos, table, h, w, out_dtype=jnp.float32, j_chunk=4, interpret=True
    )
    assert got.shape == (b * g, hg, h, m, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("h,w,g,hg", [(15, 20, 2, 2), (16, 16, 1, 2)])
def test_rpe_packed_kernel_matches_reference(h, w, g, hg):
    """Round-4 packed builder (level-3 shapes: query plane flat on lanes)."""
    from ir_ads_tpu.ops.pallas_dscf_rpe import (
        dscf_rpe_bias_packed_pallas,
        dscf_rpe_bias_packed_reference,
    )

    b, m = 2, 8
    s1, s2 = 23, 31
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    pos = jax.random.uniform(k1, (b * g, m, 2), jnp.float32, -1.0, 1.0)
    table = jax.random.normal(k2, (g, hg, s1, s2), jnp.float32)

    want = dscf_rpe_bias_packed_reference(
        pos, table, h, w, out_dtype=jnp.float32
    )
    got = dscf_rpe_bias_packed_pallas(
        pos, table, h, w, out_dtype=jnp.float32, j_chunk=4, interpret=True
    )
    assert got.shape == (b * g, hg, m, h * w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_rpe_packed_grads_match_reference():
    from ir_ads_tpu.ops.pallas_dscf_rpe import (
        dscf_rpe_bias_packed,
        dscf_rpe_bias_packed_reference,
    )

    h, w, g, hg, b, m = 15, 20, 1, 2, 1, 8
    s1, s2 = 23, 31
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    pos = jax.random.uniform(k1, (b * g, m, 2), jnp.float32, -0.9, 0.9)
    table = jax.random.normal(k2, (g, hg, s1, s2), jnp.float32)

    import os

    os.environ["IR_ADS_PALLAS_INTERPRET"] = "1"
    try:
        gp, gt = jax.grad(
            lambda p, t: jnp.sum(
                dscf_rpe_bias_packed(p, t, h, w, jnp.float32) ** 2
            ),
            argnums=(0, 1),
        )(pos, table)
    finally:
        del os.environ["IR_ADS_PALLAS_INTERPRET"]
    wp, wt = jax.grad(
        lambda p, t: jnp.sum(
            dscf_rpe_bias_packed_reference(p, t, h, w, jnp.float32) ** 2
        ),
        argnums=(0, 1),
    )(pos, table)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(wt), rtol=1e-4,
                               atol=1e-4)


def test_pick_tile_r_respects_block_rule():
    # (15, 20): no divisor t of 15 has 8 | t*20 -> must take the whole plane
    # (this is DSCF level 3 of the 480x640 headline bench; the r1->r2 bench
    # fallback was caused by tile_r=5 here)
    assert pallas_dscf._pick_tile_r(15, 20) == 15
    assert pallas_dscf._pick_tile_r(120, 160) == 8
    assert pallas_dscf._pick_tile_r(30, 40) == 6
    for h, w in [(15, 20), (120, 160), (30, 40), (7, 24), (9, 20)]:
        t = pallas_dscf._pick_tile_r(h, w)
        assert h % t == 0
        assert (t * w) % 8 == 0 or t == h


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize(
    "m,mp,shape",
    [(16, 16, None), (12, 16, None), (16, 16, (2, 15, 20, 16, 2))],
)
def test_rows_attention_kernel_matches_reference(m, mp, shape, packed):
    bg, h, w, gc, hg = shape or (2, 8, 16, 16, 2)
    scale = 0.25
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (bg, h * w, gc), jnp.float32)
    k = jax.random.normal(ks[1], (bg, mp, gc), jnp.float32)
    v = jax.random.normal(ks[2], (bg, mp, gc), jnp.float32)
    if mp != m:  # padded keys must be ignored regardless of content
        k = k.at[:, m:].set(3.0)
        v = v.at[:, m:].set(5.0)
    bias = jax.random.normal(ks[3], (bg, hg, h, m, w), jnp.float32)

    want = dscf_rows_reference(q, k, v, bias, scale, hg)
    got = pallas_dscf_attention_rows(
        q, k, v, bias, scale, hg, interpret=True, packed=packed
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_rows_attention_packed_matches_unpacked_bf16():
    """The packed kernel at the production dtype: scores are bitwise the
    per-slot dots (block-diag zero lanes contribute exact 0.0), so packed
    vs unpacked differ only by the pre- vs post-softmax normalization
    order (~1 ulp)."""
    bg, h, w, gc, hg, m = 2, 12, 16, 16, 2, 24
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (bg, h * w, gc), jnp.bfloat16)
    k = jax.random.normal(ks[1], (bg, m, gc), jnp.bfloat16)
    v = jax.random.normal(ks[2], (bg, m, gc), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (bg, hg, h, m, w), jnp.bfloat16)
    a = pallas_dscf_attention_rows(
        q, k, v, bias, 0.25, hg, interpret=True, packed=False
    )
    b = pallas_dscf_attention_rows(
        q, k, v, bias, 0.25, hg, interpret=True, packed=True
    )
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def _interp(monkeypatch):
    orig_attn = pallas_dscf.pallas_dscf_attention_rows
    monkeypatch.setattr(
        pallas_dscf,
        "pallas_dscf_attention_rows",
        lambda *a, **kw: orig_attn(*a, **{**kw, "interpret": True}),
    )
    orig_rpe = pallas_rpe.dscf_rpe_bias_rows_pallas
    monkeypatch.setattr(
        pallas_rpe,
        "dscf_rpe_bias_rows_pallas",
        lambda *a, **kw: orig_rpe(*a, **{**kw, "interpret": True}),
    )


@pytest.mark.slow
def test_dattention_pallas3_matches_xla(monkeypatch):
    _interp(monkeypatch)
    b, h, w, c = 2, 16, 16, 32
    g, heads, stride = 2, 4, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    y = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    mod_xla = DAttentionMM(
        dim=c, n_heads=heads, n_groups=g, stride=stride, attn_impl="xla"
    )
    mod_p3 = DAttentionMM(
        dim=c, n_heads=heads, n_groups=g, stride=stride, attn_impl="pallas3"
    )
    variables = mod_xla.init({"params": jax.random.PRNGKey(0)}, x, y)
    out_xla = mod_xla.apply(variables, x, y, False)
    out_p3 = mod_p3.apply(variables, x, y, False)
    np.testing.assert_allclose(
        np.asarray(out_p3), np.asarray(out_xla), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_dattention_xla_packed_rpe_matches_xla(monkeypatch):
    """The round-4 packed rpe builder inside the XLA attention branch
    (production level 3) matches the einsum rpe bit-for-bit up to f32
    association order."""
    import os

    monkeypatch.setenv("IR_ADS_PALLAS_INTERPRET", "1")
    b, h, w, c = 2, 15, 20, 32
    g, heads, stride = 2, 4, 1
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    y = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    mod = DAttentionMM(
        dim=c, n_heads=heads, n_groups=g, stride=stride, attn_impl="xla"
    )
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, y)
    monkeypatch.setenv("IR_ADS_DSCF_RPE3", "xla")
    out_xla = mod.apply(variables, x, y, False)
    monkeypatch.setenv("IR_ADS_DSCF_RPE3", "pallas")
    out_packed = mod.apply(variables, x, y, False)
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_xla), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow  # opt-in RPE_XLA=2 variant (measured a perf loss;
# kept for the ledger) — equivalence needn't run in the fast tier
def test_dattention_xla_headfirst_rpe_matches_xla(monkeypatch):
    """Round-4 head-first single-einsum rpe (IR_ADS_DSCF_RPE_XLA=2) in the
    XLA attention branch == the two-call hg-minor einsum path (same math,
    different layout/fusion)."""
    b, h, w, c = 2, 15, 20, 32
    g, heads, stride = 2, 4, 1
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    y = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    mod = DAttentionMM(
        dim=c, n_heads=heads, n_groups=g, stride=stride, attn_impl="xla"
    )
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, y)
    monkeypatch.setenv("IR_ADS_DSCF_RPE3", "xla")
    monkeypatch.setenv("IR_ADS_DSCF_RPE_XLA", "1")
    out_base = mod.apply(variables, x, y, False)
    monkeypatch.setenv("IR_ADS_DSCF_RPE_XLA", "2")
    out_hf = mod.apply(variables, x, y, False)
    np.testing.assert_allclose(
        np.asarray(out_hf), np.asarray(out_base), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_dattention_pallas3_gradients(monkeypatch):
    _interp(monkeypatch)
    b, h, w, c = 1, 8, 8, 16
    mod = DAttentionMM(
        dim=c, n_heads=2, n_groups=1, stride=2, attn_impl="pallas3"
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    y = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, y)

    def loss(params, impl):
        out = DAttentionMM(
            dim=c, n_heads=2, n_groups=1, stride=2, attn_impl=impl
        ).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, y, True,
            mutable=["batch_stats"],
        )[0]
        return jnp.sum(out**2)

    from jax.flatten_util import ravel_pytree

    g_p3 = jax.grad(loss)(variables["params"], "pallas3")
    g_xla = jax.grad(loss)(variables["params"], "xla")
    # backward is the XLA rows reference -> must match the plain path closely
    flat_p3, _ = ravel_pytree(g_p3)
    flat_xla, _ = ravel_pytree(g_xla)
    assert bool(jnp.all(jnp.isfinite(flat_p3)))
    np.testing.assert_allclose(
        np.asarray(flat_p3), np.asarray(flat_xla), rtol=5e-3, atol=5e-3
    )
    assert float(jnp.sum(jnp.abs(g_p3["rpe_table"]))) > 0.0


def test_offset_head_shift_variant_matches_conv(monkeypatch):
    """IR_ADS_DSCF_OFFSET=shift: the depthwise 9x9 strided conv as K^2
    strided-slice FMAs — same params (tree-identical), f32 accumulation,
    agrees with the nn.Conv path to bf16 tolerance."""
    from ir_ads_tpu.models.backbones.swin import LayerNormGELUOffset

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 24, 32, 16).astype(np.float32))
    m = LayerNormGELUOffset(16, 9, 8, dtype=jnp.bfloat16)
    monkeypatch.setenv("IR_ADS_DSCF_OFFSET", "conv")
    variables = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(variables, x), np.float32)
    monkeypatch.setenv("IR_ADS_DSCF_OFFSET", "shift")
    v2 = m.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(v2)
    )
    got = np.asarray(m.apply(variables, x), np.float32)
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


@pytest.mark.parametrize("m,mp", [(8, 8), (5, 8)])
def test_rows_bwd_kernel_matches_reference_vjp(m, mp):
    """Round-5 manual backward (pallas_dscf_rows_bwd): grads for q/k/v/bias
    match jax.vjp of the rows reference, incl. padded keys; dbias leaves in
    the rows layout the rpe builder's backward consumes."""
    from ir_ads_tpu.ops.pallas_dscf import pallas_dscf_rows_bwd

    bg, h, w, gc, hg = 2, 8, 16, 16, 2
    scale = 0.25
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    q = jax.random.normal(ks[0], (bg, h * w, gc), jnp.float32)
    k = jax.random.normal(ks[1], (bg, mp, gc), jnp.float32)
    v = jax.random.normal(ks[2], (bg, mp, gc), jnp.float32)
    if mp != m:
        k = k.at[:, m:].set(3.0)
        v = v.at[:, m:].set(5.0)
    bias = jax.random.normal(ks[3], (bg, hg, h, m, w), jnp.float32)
    g = jax.random.normal(ks[4], (bg, h * w, gc), jnp.float32)

    dq, dk, dv, dbias = pallas_dscf_rows_bwd(
        q, k, v, bias, g, scale, hg, interpret=True
    )
    _, vjp = jax.vjp(
        lambda a, b, c, d: dscf_rows_reference(a, b, c, d, scale, hg),
        q, k, v, bias,
    )
    wq, wk, wv, wb = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(wq),
                               rtol=5e-4, atol=5e-4)
    # padded key rows must carry zero grads
    if mp != m:
        assert float(jnp.max(jnp.abs(dk[:, m:]))) == 0.0
        assert float(jnp.max(jnp.abs(dv[:, m:]))) == 0.0
    np.testing.assert_allclose(np.asarray(dk), np.asarray(wk),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(wv),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(wb),
                               rtol=5e-4, atol=5e-4)


def test_rows_bwd_dispatch_through_custom_vjp(monkeypatch):
    """dscf_attention_rows grads via IR_ADS_DSCF_BWD=pallas == xla."""
    from ir_ads_tpu.ops.pallas_dscf import dscf_attention_rows

    monkeypatch.setenv("IR_ADS_PALLAS_INTERPRET", "1")
    bg, h, w, gc, hg, m = 1, 8, 16, 16, 2, 8
    scale = 0.25
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    q = jax.random.normal(ks[0], (bg, h * w, gc), jnp.float32)
    k = jax.random.normal(ks[1], (bg, m, gc), jnp.float32)
    v = jax.random.normal(ks[2], (bg, m, gc), jnp.float32)
    bias = jax.random.normal(ks[3], (bg, hg, h, m, w), jnp.float32)

    def loss(*args):
        return jnp.sum(dscf_attention_rows(*args, scale, hg) ** 2)

    grads = {}
    for mode in ("pallas", "xla"):
        monkeypatch.setenv("IR_ADS_DSCF_BWD", mode)
        grads[mode] = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(grads["pallas"], grads["xla"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
