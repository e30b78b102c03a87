"""Spatial sharding of the REAL CMNeXt architecture (VERDICT r2 item 7).

The round-2 exactness test covered a pure-Swin model, where a halo that
covers the receptive field gives bit-exact inter-shard boundaries.  CMNeXt's
DSCF (DAttentionMM) breaks whole-image equality BY CONSTRUCTION:

  * its deformable offsets are predicted in NORMALIZED strip coordinates
    (offset 0.1 displaces by 0.1 * strip_h/2 pixels, not image_h/2),
  * its sampling field is global (clip to [-1, 1] spans the whole strip),
    so no fixed halo covers the receptive field, and
  * the continuous rpe table is indexed by (q - pos)/2 in the same
    normalized coordinates.

Measured here (tiny full-architecture CMNeXt, random init): max-abs logit
deviation vs the unsharded forward is ~1.5x logit std — i.e. spatially
sharded DSCF is NOT an approximation of the whole-image forward; it is a
DIFFERENT (tile-frame) computation.  This matches the reference's own
sliding-tile inference semantics (val_mm.py:30-62: each tile is its own
DSCF coordinate frame), so the correct contract — documented in
EVAL.SPATIAL_SHARD (val_mm.py / semseg_eval.py) — is:

  * pure-Swin trunks: exact at inter-shard boundaries (round-2 test), and
  * DSCF models: each strip's output must EXACTLY equal running the model
    on that strip's haloed crop (tile semantics) — which is what this test
    asserts, pinning the halo-exchange plumbing on the full architecture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.evaluation.semseg_eval import make_spatial_sharded_forward
from ir_ads_tpu.models.cmnext import CMNeXt
from ir_ads_tpu.parallel.mesh import make_mesh

from tests.conftest import requires_devices

pytestmark = pytest.mark.slow


@requires_devices(2)
def test_spatial_shard_full_cmnext_tile_equivalence():
    # full architecture at tiny dims: 4 stages, DSCF at every level, MPG,
    # SegFormer fused head.  window 4, patch 4 -> 16 px window granularity;
    # strips of 128 px with halo 64 align at every stage.
    model = CMNeXt(
        backbone="SwinTransformer-B", num_classes=5,
        backbone_kwargs=dict(
            embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
            window_size=4, drop_path_rate=0.0,
        ),
        head_dims=(32, 16), mmst_mask=False,
    )
    b, h, w = 1, 256, 64
    halo = 64
    n_shards = 2
    hl = h // n_shards
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, 3))
    dte = jax.random.normal(jax.random.fold_in(key, 2), (b, h, w, 3))
    variables = model.init({"params": jax.random.PRNGKey(3)}, rgb, dte)

    def fwd(r, d):
        return model.apply(variables, r, d, train=False)[0]

    mesh = make_mesh(data=1, space=n_shards, devices=jax.devices()[:2])

    def packed_forward(packed):
        return model.apply(
            variables, packed[..., :3], packed[..., 3:], train=False
        )[0]

    predict = make_spatial_sharded_forward(packed_forward, mesh, halo=halo)
    got = np.asarray(predict(rgb, dte))
    assert got.shape == (b, h, w, 5)

    # tile-equivalence: every strip == the model run on its haloed crop
    # (zero rows where the halo extends beyond the image), cropped back.
    # This is the DSCF-model contract of EVAL.SPATIAL_SHARD — identical
    # semantics to the reference's sliding tiles, distributed over chips.
    packed = np.concatenate([np.asarray(rgb), np.asarray(dte)], axis=-1)
    for s in range(n_shards):
        lo, hi = s * hl, (s + 1) * hl
        crop = np.zeros((b, hl + 2 * halo, w, 6), packed.dtype)
        src_lo, src_hi = max(lo - halo, 0), min(hi + halo, h)
        dst_lo = src_lo - (lo - halo)
        crop[:, dst_lo : dst_lo + (src_hi - src_lo)] = packed[
            :, src_lo:src_hi
        ]
        ref = np.asarray(
            fwd(jnp.asarray(crop[..., :3]), jnp.asarray(crop[..., 3:]))
        )[:, halo : halo + hl]
        np.testing.assert_allclose(
            got[:, lo:hi], ref, rtol=2e-4, atol=2e-4,
            err_msg=f"strip {s} != model(haloed crop) — halo plumbing",
        )

    # document the whole-image deviation (expected LARGE for DSCF models —
    # tile-frame vs global-frame coordinates; see module docstring)
    want = np.asarray(fwd(rgb, dte))
    rel = float(np.abs(got - want).max()) / float(want.std())
    print(f"spatial-shard CMNeXt whole-image deviation: {rel:.3f} "
          "of logit std (expected O(1): tile-frame DSCF)")
    assert np.isfinite(got).all()
