"""Low-res flip-ensemble eval path (round-4 headline-wrapper fix).

With CMNeXt(upsample_logits=False) the heads return H/4 logits; the
sliding-window wrapper flip-ensembles at that resolution and bilinearly
upsamples ONCE.  Exactness argument: horizontal flip commutes with the
symmetric align_corners=False bilinear grid, and the ensemble sum commutes
with any linear map — so the result equals the reference order (upsample
each member, then sum) up to float addition order.  These tests pin that
equivalence through the real sliding/flip wrapper (reference semantics:
val_mm.py:30-62).
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.evaluation.semseg_eval import make_sliding_window_fn
from ir_ads_tpu.models.cmnext import CMNeXt
from ir_ads_tpu.ops.layers import resize_bilinear


def test_flip_commutes_with_resize():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    a = resize_bilinear(x, (32, 48), align_corners=False)[:, :, ::-1]
    b = resize_bilinear(x[:, :, ::-1], (32, 48), align_corners=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def _tiny(upsample):
    return CMNeXt(
        backbone="SwinTransformer-B",
        num_classes=5,
        mmst_mask=False,
        upsample_logits=upsample,
        backbone_kwargs=dict(
            embed_dim=16, depths=(1, 1), num_heads=(2, 4), window_size=4
        ),
    )


@pytest.mark.slow  # ~85 s of tiny-model CPU compiles; the multitile
# variant below keeps the exactness pinned in the fast tier
def test_sliding_lowres_matches_fullres():
    b, h, w = 2, 32, 32
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    dte = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))

    hi = _tiny(True)
    variables = hi.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    lo = _tiny(False)

    def make(model):
        fwd = lambda r, d: model.apply(variables, r, d, False)[0]
        return make_sliding_window_fn(
            fwd, (h, w), (h, w), 5, overlap=1.0 / 3.0, flip=True, fuse=True
        )

    want = np.asarray(make(hi)(rgb, dte))
    got = np.asarray(make(lo)(rgb, dte))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.slow  # ~45 s: two msf_logits builds of the tiny model
def test_msf_lowres_matches_fullres():
    # msf_logits must reproduce the reference two-stage resize for
    # head-native logits: model align_corners=False upsample to the scaled
    # resolution, THEN the align_corners=True MSF resize (ADVICE r4 medium).
    from ir_ads_tpu.evaluation.semseg_eval import msf_logits

    b, h, w = 1, 32, 32
    rng = np.random.RandomState(3)
    rgb = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    dte = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))

    hi = _tiny(True)
    variables = hi.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    lo = _tiny(False)

    def make(model):
        return lambda r, d: model.apply(variables, r, d, False)[0]

    scales = (1.0, 1.5)
    want = np.asarray(msf_logits(make(hi), rgb, dte, scales=scales))
    got = np.asarray(msf_logits(make(lo), rgb, dte, scales=scales))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.slow  # ~60 s: multitile variant; single-tile parity stays fast
def test_sliding_lowres_matches_fullres_multitile():
    # tile < image: the low-res upsample must land at TILE resolution
    # before the overlap-add
    b, h, w = 1, 48, 64
    rng = np.random.RandomState(2)
    rgb = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    dte = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))

    hi = _tiny(True)
    variables = hi.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    lo = _tiny(False)

    def make(model, fuse):
        fwd = lambda r, d: model.apply(variables, r, d, False)[0]
        return make_sliding_window_fn(
            fwd, (h, w), (32, 32), 5, overlap=1.0 / 3.0, flip=True, fuse=fuse
        )

    want = np.asarray(make(hi, True)(rgb, dte))
    for fuse in (True, False):
        got = np.asarray(make(lo, fuse)(rgb, dte))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
