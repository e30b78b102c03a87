"""FLAT (B, H, W*3) lane-dense input path (round-4 patch-embed fix).

A trailing dim of 3 forces (8,128)-tiled device buffers padded 42x; the
flat feed keeps them dense (dev/probe_patchembed.py).  These tests pin the
flat path bitwise against the NHWC path — same parameters, same math,
only the input layout differs — through PatchEmbed and the full model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.ops.layers import PatchEmbed


@pytest.mark.parametrize("h,w", [(16, 24), (14, 22)])  # pad + no-pad
def test_patch_embed_flat_matches_nhwc(h, w):
    b, c = 2, 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    m = PatchEmbed(embed_dim=32)
    variables = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(variables, x)
    got = m.apply(variables, x.reshape(b, h, w * c))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_cmnext_flat_matches_nhwc():
    from ir_ads_tpu.models.cmnext import CMNeXt

    b, h, w = 1, 32, 32
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    dte = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    model = CMNeXt(
        backbone="SwinTransformer-B",
        num_classes=5,
        backbone_kwargs=dict(
            embed_dim=16, depths=(1, 1), num_heads=(2, 4), window_size=4
        ),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    want = model.apply(variables, rgb, dte, False)[0]
    got = model.apply(
        variables, rgb.reshape(b, h, w * 3), dte.reshape(b, h, w * 3), False
    )[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_patch_embed_pallas_kernel_bitwise(monkeypatch):
    """IR_ADS_PATCH_EMBED=pallas (round-5 fused patchify kernel): bitwise
    vs the XLA flat path in interpret mode (same rounding points)."""
    import os

    from ir_ads_tpu.ops.layers import PatchEmbed

    monkeypatch.setenv("IR_ADS_PALLAS_INTERPRET", "1")
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 16, 24 * 3).astype(np.float32))
    pe = PatchEmbed(embed_dim=32, patch_size=4, dtype=jnp.bfloat16)
    variables = pe.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("IR_ADS_PATCH_EMBED", "xla")
    want = np.asarray(pe.apply(variables, x), np.float32)
    monkeypatch.setenv("IR_ADS_PATCH_EMBED", "pallas")
    got = np.asarray(pe.apply(variables, x), np.float32)
    np.testing.assert_array_equal(got, want)
