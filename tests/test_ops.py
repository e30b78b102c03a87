"""Primitive-op parity tests.

Pattern follows the reference's detrex tests (tests/test_ms_deform_attn.py):
each TPU-native op is compared against an independently written reference
implementation — here torch CPU ops, which are the exact functions the
reference framework calls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from ir_ads_tpu.ops import (
    adaptive_pad,
    grid_sample,
    relative_position_index,
    resize_bilinear,
    shift_window_mask,
    window_partition,
    window_reverse,
)


def test_grid_sample_matches_torch_align_corners():
    rng = np.random.RandomState(0)
    img = rng.randn(2, 9, 13, 5).astype(np.float32)
    grid = (rng.rand(2, 7, 4, 2).astype(np.float32) * 2.4) - 1.2  # incl. OOB

    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=True)
    ref = TF.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_grid_sample_matches_torch_no_align():
    rng = np.random.RandomState(1)
    img = rng.randn(1, 6, 6, 3).astype(np.float32)
    grid = (rng.rand(1, 5, 5, 2).astype(np.float32) * 2.0) - 1.0

    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=False)
    ref = TF.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_grid_sample_matmul_matches_torch():
    """The separable hat-weight formulation is exactly torch grid_sample
    (zeros padding), including out-of-bounds partial-weight cells."""
    from ir_ads_tpu.ops.grid_sample import grid_sample_matmul

    rng = np.random.RandomState(7)
    img = rng.randn(2, 9, 13, 5).astype(np.float32)
    grid = (rng.rand(2, 7, 4, 2).astype(np.float32) * 2.4) - 1.2  # incl. OOB
    for align in (True, False):
        ours = grid_sample_matmul(
            jnp.asarray(img), jnp.asarray(grid), align_corners=align
        )
        ref = TF.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=align,
        ).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@pytest.mark.slow  # ~20 s CPU compile; fwd parity + module grads stay fast
def test_grid_sample_grad_matches_torch():
    rng = np.random.RandomState(2)
    img = rng.randn(1, 5, 5, 2).astype(np.float32)
    grid = (rng.rand(1, 3, 3, 2).astype(np.float32) * 1.8) - 0.9

    def loss_jax(i, g):
        return jnp.sum(grid_sample(i, g, align_corners=True) ** 2)

    gi, gg = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))

    ti = torch.from_numpy(img).permute(0, 3, 1, 2).requires_grad_(True)
    tg = torch.from_numpy(grid).requires_grad_(True)
    out = TF.grid_sample(ti, tg, mode="bilinear", padding_mode="zeros", align_corners=True)
    (out**2).sum().backward()
    np.testing.assert_allclose(
        np.asarray(gi), ti.grad.permute(0, 2, 3, 1).numpy(), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(gg), tg.grad.numpy(), atol=1e-4)


def test_window_partition_roundtrip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 24, 36, 8).astype(np.float32))
    wins = window_partition(x, 12)
    assert wins.shape == (2 * 2 * 3, 144, 8)
    back = window_reverse(wins, 12, 24, 36)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_matches_reference_formula():
    # Independent torch construction of the mmseg double_step_seq index.
    wh, ww = 5, 7
    seq1 = torch.arange(0, (2 * ww - 1) * wh, 2 * ww - 1)
    seq2 = torch.arange(0, ww)
    coords = (seq1[:, None] + seq2[None, :]).reshape(1, -1)
    ref = (coords + coords.T).flip(1)
    ours = relative_position_index(wh, ww)
    np.testing.assert_array_equal(ours, ref.numpy())
    assert ours.max() == (2 * wh - 1) * (2 * ww - 1) - 1


def test_shift_window_mask_matches_torch_loop():
    hp, wp, ws, shift = 24, 36, 12, 6
    img_mask = torch.zeros((1, hp, wp, 1))
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    m = img_mask.view(1, hp // ws, ws, wp // ws, ws, 1)
    m = m.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = m.unsqueeze(1) - m.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(
        attn_mask == 0, 0.0
    )
    ours = shift_window_mask(hp, wp, ws, shift)
    np.testing.assert_array_equal(ours, attn_mask.numpy())


def test_patch_merging_matches_torch_unfold_order():
    from ir_ads_tpu.ops import PatchMerging

    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 10, 6).astype(np.float32)
    pm = PatchMerging(out_dim=12, use_norm=False)
    params = pm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = pm.apply(params, jnp.asarray(x))

    # torch reference: unfold then linear with the same kernel
    kernel = np.asarray(params["params"]["reduction"]["kernel"])  # (24, 12)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    unfolded = torch.nn.Unfold(kernel_size=2, stride=2)(xt)  # (B, 4C, L)
    ref = unfolded.transpose(1, 2) @ torch.from_numpy(kernel)
    ref = ref.reshape(2, 4, 5, 12)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@pytest.mark.slow  # ~18 s: layout-variant A/B; unfold-order parity stays fast
def test_patch_merging_slice_path_matches_default(monkeypatch):
    """IR_ADS_MERGE=slice (transpose-free LN+reduction) == default path.

    Same params, same math up to fp reassociation: LN stats are computed by
    reducing the untransposed (B,H/2,2,W/2,2,C) array and the 4C reduction
    matmul is split into four per-(ky,kx) channel-slice dots summed in f32.
    """
    from ir_ads_tpu.ops import PatchMerging

    rng = np.random.RandomState(11)
    x = rng.randn(2, 9, 11, 8).astype(np.float32)  # odd H/W: exercises pad
    pm = PatchMerging(out_dim=16, use_norm=True)
    params = pm.init(jax.random.PRNGKey(3), jnp.asarray(x))
    base = np.asarray(pm.apply(params, jnp.asarray(x)))

    monkeypatch.setenv("IR_ADS_MERGE", "slice")
    ours = np.asarray(pm.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, base, atol=2e-5, rtol=2e-5)

    # bf16 compute dtype too (the production configuration)
    pmb = PatchMerging(out_dim=16, use_norm=True, dtype=jnp.bfloat16)
    xb = jnp.asarray(x, jnp.bfloat16)
    monkeypatch.delenv("IR_ADS_MERGE")
    baseb = np.asarray(pmb.apply(params, xb), np.float32)
    monkeypatch.setenv("IR_ADS_MERGE", "slice")
    oursb = np.asarray(pmb.apply(params, xb), np.float32)
    scale = np.abs(baseb).max()
    assert np.abs(oursb - baseb).max() <= 0.03 * scale


@pytest.mark.parametrize("align", [True, False])
def test_resize_bilinear_matches_torch(align):
    rng = np.random.RandomState(5)
    x = rng.randn(2, 7, 9, 4).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), (15, 20), align_corners=align)
    ref = TF.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=(15, 20),
        mode="bilinear",
        align_corners=align,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_adaptive_pad_corner():
    x = jnp.zeros((1, 15, 17, 1))
    y = adaptive_pad(x, (4, 4), (4, 4), "corner")
    assert y.shape == (1, 16, 20, 1)
    x = jnp.zeros((1, 16, 16, 1))
    assert adaptive_pad(x, (4, 4), (4, 4), "corner").shape == (1, 16, 16, 1)
