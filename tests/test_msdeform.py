"""MSDeformAttn vs an independent torch reference (the detrex pure-torch
fallback semantics, reimplemented in tests/utils style) + gradient check —
the rebuild of reference tests/test_ms_deform_attn.py for TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from ir_ads_tpu.detection.msdeform_attn import ms_deform_attn


def torch_ms_deform_attn(value, spatial_shapes, locations, weights):
    """Independent torch impl of multi-scale deformable sampling
    (detrex multi_scale_deform_attn.py:96-138 semantics)."""
    bs, _, n_heads, d = value.shape
    _, lq, _, n_levels, n_points, _ = locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    grids = 2 * locations - 1
    sampled = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = (
            value_list[lvl]
            .flatten(2)
            .transpose(1, 2)
            .reshape(bs * n_heads, d, h, w)
        )
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        sampled.append(
            TF.grid_sample(
                v, g, mode="bilinear", padding_mode="zeros", align_corners=False
            )
        )
    w_ = weights.transpose(1, 2).reshape(bs * n_heads, 1, lq, n_levels * n_points)
    out = (
        (torch.stack(sampled, dim=-2).flatten(-2) * w_)
        .sum(-1)
        .view(bs, n_heads * d, lq)
    )
    return out.transpose(1, 2).contiguous()


def _data(seed=0, bs=2, heads=4, d=8, lq=6, points=3):
    rng = np.random.RandomState(seed)
    shapes = ((6, 8), (3, 4), (2, 2))
    n_value = sum(h * w for h, w in shapes)
    value = rng.randn(bs, n_value, heads, d).astype(np.float32)
    locations = rng.rand(bs, lq, heads, len(shapes), points, 2).astype(
        np.float32
    ) * 1.2 - 0.1  # include out-of-bounds
    weights = rng.rand(bs, lq, heads, len(shapes), points).astype(np.float32)
    weights /= weights.reshape(bs, lq, heads, -1).sum(-1)[..., None, None]
    return value, shapes, locations, weights


def test_ms_deform_attn_matches_torch():
    value, shapes, locations, weights = _data()
    ours = ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locations), jnp.asarray(weights)
    )
    ref = torch_ms_deform_attn(
        torch.from_numpy(value),
        shapes,
        torch.from_numpy(locations),
        torch.from_numpy(weights),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_ms_deform_attn_xla2_matches_torch():
    """Single-gather formulation (take_along_axis on the level-concat
    stack) is exact vs the torch oracle, including out-of-bounds zeros."""
    from ir_ads_tpu.detection.msdeform_attn import ms_deform_attn_xla2

    value, shapes, locations, weights = _data(seed=2)
    ours = ms_deform_attn_xla2(
        jnp.asarray(value), shapes, jnp.asarray(locations), jnp.asarray(weights)
    )
    ref = torch_ms_deform_attn(
        torch.from_numpy(value),
        shapes,
        torch.from_numpy(locations),
        torch.from_numpy(weights),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_ms_deform_attn_xla2_grads_match_torch():
    from ir_ads_tpu.detection.msdeform_attn import ms_deform_attn_xla2

    value, shapes, locations, weights = _data(seed=3)

    def loss_jax(v, loc, w):
        return jnp.sum(ms_deform_attn_xla2(v, shapes, loc, w) ** 2)

    gv, gl, gw = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locations), jnp.asarray(weights)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locations).requires_grad_(True)
    tw = torch.from_numpy(weights).requires_grad_(True)
    (torch_ms_deform_attn(tv, shapes, tl, tw) ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=1e-4)


def test_ms_deform_attn_xla3_matches_torch():
    """One-hot-matmul formulation (chunked MXU gather) vs the torch
    oracle, chunk boundary exercised via a small chunk."""
    from ir_ads_tpu.detection import msdeform_attn as M

    value, shapes, locations, weights = _data(seed=5)
    ours = M.ms_deform_attn_xla3(
        jnp.asarray(value), shapes, jnp.asarray(locations), jnp.asarray(weights)
    )
    ref = torch_ms_deform_attn(
        torch.from_numpy(value),
        shapes,
        torch.from_numpy(locations),
        torch.from_numpy(weights),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)

    # chunked one-hot gather == take_along_axis
    rng = np.random.RandomState(7)
    v = jnp.asarray(rng.randn(3, 70, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 70, (3, 20)), jnp.int32)
    got = M._gather_onehot(v, idx, chunk=16)
    want = jnp.take_along_axis(v, idx[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_ms_deform_attn_xla3_grads_match_torch():
    from ir_ads_tpu.detection.msdeform_attn import ms_deform_attn_xla3

    value, shapes, locations, weights = _data(seed=6)

    def loss_jax(v, loc, w):
        return jnp.sum(ms_deform_attn_xla3(v, shapes, loc, w) ** 2)

    gv, gl, gw = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locations), jnp.asarray(weights)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locations).requires_grad_(True)
    tw = torch.from_numpy(weights).requires_grad_(True)
    (torch_ms_deform_attn(tv, shapes, tl, tw) ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=1e-4)


def test_ms_deform_attn_xla4_matches_torch():
    """Mixed patch-gather + one-hot formulation vs the torch oracle,
    both per-level paths forced via the threshold."""
    from ir_ads_tpu.detection.msdeform_attn import ms_deform_attn_xla4

    value, shapes, locations, weights = _data(seed=8)
    ref = torch_ms_deform_attn(
        torch.from_numpy(value),
        shapes,
        torch.from_numpy(locations),
        torch.from_numpy(weights),
    )
    for thresh in (0, 10, 10**6):
        ours = ms_deform_attn_xla4(
            jnp.asarray(value), shapes, jnp.asarray(locations),
            jnp.asarray(weights), onehot_max_hw=thresh,
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_ms_deform_attn_xla4_grads_match_torch():
    from ir_ads_tpu.detection.msdeform_attn import ms_deform_attn_xla4

    value, shapes, locations, weights = _data(seed=9)

    def loss_jax(v, loc, w):
        return jnp.sum(
            ms_deform_attn_xla4(v, shapes, loc, w, onehot_max_hw=10) ** 2
        )

    gv, gl, gw = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locations), jnp.asarray(weights)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locations).requires_grad_(True)
    tw = torch.from_numpy(weights).requires_grad_(True)
    (torch_ms_deform_attn(tv, shapes, tl, tw) ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=1e-4)


def test_ms_deform_attn_grads_match_torch():
    value, shapes, locations, weights = _data(seed=1)

    def loss_jax(v, loc, w):
        return jnp.sum(ms_deform_attn(v, shapes, loc, w) ** 2)

    gv, gl, gw = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locations), jnp.asarray(weights)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locations).requires_grad_(True)
    tw = torch.from_numpy(weights).requires_grad_(True)
    (torch_ms_deform_attn(tv, shapes, tl, tw) ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=1e-4)


def test_msdeform_module_runs():
    from ir_ads_tpu.detection.msdeform_attn import MSDeformAttention

    shapes = ((8, 8), (4, 4))
    n_value = sum(h * w for h, w in shapes)
    m = MSDeformAttention(embed_dim=32, num_heads=4, num_levels=2, num_points=2)
    q = jnp.ones((2, 10, 32))
    v = jnp.ones((2, n_value, 32))
    ref = jnp.full((2, 10, 2, 2), 0.5)
    params = m.init(jax.random.PRNGKey(0), q, v, ref, shapes)
    out = m.apply(params, q, v, ref, shapes)
    assert out.shape == (2, 10, 32)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.slow  # ~18 s: dispatch-matrix variant; xla4 grads stay fast
def test_xla4_xlabwd_dispatch_grads_match_torch(monkeypatch):
    """The train-path dispatch (IR_ADS_MSDEFORM=xla4 -> custom_vjp with
    the plain-gather backward) must produce the oracle gradients: the
    patch-slice gather's native transpose is a 2x2-slice scatter that
    crashes the relay compile helper, so training recomputes the vjp
    through ms_deform_attn_xla (identical math)."""
    monkeypatch.setenv("IR_ADS_MSDEFORM", "xla4")
    monkeypatch.setenv("IR_ADS_MSDEFORM_BWD", "xla")
    value, shapes, locations, weights = _data(seed=5)

    def loss_jax(v, loc, w):
        return jnp.sum(ms_deform_attn(v, shapes, loc, w) ** 2)

    gv, gl, gw = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locations), jnp.asarray(weights)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locations).requires_grad_(True)
    tw = torch.from_numpy(weights).requires_grad_(True)
    (torch_ms_deform_attn(tv, shapes, tl, tw) ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), atol=1e-4)


@pytest.mark.slow  # ~25 s: per-level-bwd variant sweep; xla4 grads stay fast
def test_ms_deform_attn_xla5_matches_xla_incl_grads():
    """xla5 (round-5 per-level backward: native one-hot AD at small
    levels, plain per-corner bwd at big levels) == the reference plain
    form, forward and all three gradients."""
    from ir_ads_tpu.detection.msdeform_attn import (
        ms_deform_attn_xla,
        ms_deform_attn_xla5,
    )

    rng = np.random.RandomState(0)
    shapes = ((37, 53), (19, 27), (10, 14), (5, 7))
    s = sum(h * w for h, w in shapes)
    b, heads, d, lq, p = 2, 4, 8, 60, 4
    v = jnp.asarray(rng.randn(b, s, heads, d).astype(np.float32))
    loc = jnp.asarray(rng.rand(b, lq, heads, 4, p, 2).astype(np.float32))
    att = jax.nn.softmax(
        jnp.asarray(
            rng.randn(b, lq, heads, 4, p).astype(np.float32)
        ).reshape(b, lq, heads, -1),
        -1,
    ).reshape(b, lq, heads, 4, p)

    want = np.asarray(ms_deform_attn_xla(v, shapes, loc, att))
    got = np.asarray(
        ms_deform_attn_xla5(v, shapes, loc, att, onehot_max_hw=600)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def loss(fn, *a):
        return jnp.sum(jnp.sin(fn(*a)))

    g5 = jax.grad(
        lambda v, l, w: loss(
            lambda *a: ms_deform_attn_xla5(*a, onehot_max_hw=600),
            v, shapes, l, w,
        ),
        argnums=(0, 1, 2),
    )(v, loc, att)
    gx = jax.grad(
        lambda v, l, w: loss(ms_deform_attn_xla, v, shapes, l, w),
        argnums=(0, 1, 2),
    )(v, loc, att)
    for a, b_ in zip(g5, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-4
        )
