"""PointRend project (reference detectron2/projects/PointRend/point_rend/):
point head, coarse head, uncertainty sampling, subdivision inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.models.projects.point_rend import (
    ConvFCHead,
    PointRendMaskHead,
    StandardPointHead,
    calculate_uncertainty,
    get_uncertain_point_coords_on_grid,
    get_uncertain_point_coords_with_randomness,
    point_coords_wrt_image,
    point_sample,
    sample_fine_features,
)


def test_point_sample_center_of_cell_exact():
    feats = jnp.arange(16.0).reshape(1, 4, 4, 1)
    # center of cell (1, 2) -> value 1*4+2 = 6 (no interpolation at centers)
    coords = jnp.asarray([[[(2 + 0.5) / 4, (1 + 0.5) / 4]]])
    out = point_sample(feats, coords)
    np.testing.assert_allclose(float(out[0, 0, 0]), 6.0, rtol=1e-6)


def test_uncertainty_is_neg_abs_of_class_logit():
    logits = jnp.asarray([[[2.0, -0.1], [-3.0, 0.5]]])  # (1, 2, 2)
    unc = calculate_uncertainty(logits, jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(unc[0]), [-0.1, -0.5], rtol=1e-6)


def test_uncertain_points_on_grid_picks_least_confident():
    unc = jnp.full((1, 4, 4), -10.0).at[0, 2, 3].set(-0.1).at[0, 0, 1].set(-0.2)
    idx, coords = get_uncertain_point_coords_on_grid(unc, 2)
    assert set(np.asarray(idx[0]).tolist()) == {2 * 4 + 3, 0 * 4 + 1}
    # coords are cell centers in [0, 1]
    assert np.allclose(sorted(np.asarray(coords[0, :, 0]).tolist()),
                       sorted([(3 + 0.5) / 4, (1 + 0.5) / 4]))


def test_heads_shapes():
    ph = StandardPointHead(num_classes=3, fc_dim=16, num_fc=2)
    fine = jnp.zeros((2, 5, 8))
    coarse = jnp.zeros((2, 5, 3))
    v = ph.init(jax.random.PRNGKey(0), fine, coarse)
    assert ph.apply(v, fine, coarse).shape == (2, 5, 3)

    ch = ConvFCHead(num_classes=3, conv_dim=8, fc_dims=(32,), output_side=7)
    x = jnp.zeros((2, 14, 14, 16))
    v = ch.init(jax.random.PRNGKey(0), x)
    assert ch.apply(v, x).shape == (2, 7, 7, 3)


def test_train_point_sampling_importance():
    key = jax.random.PRNGKey(0)
    logits = jnp.zeros((2, 8, 8, 1))
    pts = get_uncertain_point_coords_with_randomness(
        logits, jnp.zeros((2,), jnp.int32), 16, 3.0, 0.75, key
    )
    assert pts.shape == (2, 16, 2)
    assert float(pts.min()) >= 0.0 and float(pts.max()) <= 1.0


def test_point_coords_wrt_image():
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    coords = jnp.asarray([[[0.5, 0.25]]])
    img = point_coords_wrt_image(boxes, coords)
    np.testing.assert_allclose(np.asarray(img[0, 0]), [20.0, 30.0])


@pytest.mark.slow  # ~30-95 s: fast tier stays under its 10-min budget
def test_subdivision_matches_dense_point_eval():
    """With subdivision_num_points >= the full grid, every cell is
    re-predicted each step, so the final mask must equal dense point-head
    evaluation on the final grid (oracle check on random tensors)."""
    num_classes, r, pool = 2, 3, 14
    head = PointRendMaskHead(
        num_classes=num_classes,
        subdivision_steps=1,
        subdivision_num_points=14 * 14,
        init_resolution=7,
    )
    rng = np.random.RandomState(0)
    pooled = jnp.asarray(rng.randn(r, pool, pool, 8).astype(np.float32))
    fine_map = jnp.asarray(rng.randn(r, 32, 32, 8).astype(np.float32))

    def fine_fn(coords):  # roi-relative coords sampled on a per-roi map
        return point_sample(fine_map, coords)

    classes = jnp.asarray([0, 1, 0])
    p0 = jnp.zeros((r, 4, 2))
    variables = head.init(jax.random.PRNGKey(0), pooled, fine_fn(p0), p0)
    coarse = head.apply(variables, pooled, method=head.coarse)

    out = head.apply(
        variables, fine_fn, coarse, classes,
        method=head.subdivision_inference,
    )
    assert out.shape == (r, 14, 14, num_classes)

    # dense oracle on the same 14x14 grid
    xs = (jnp.arange(14, dtype=jnp.float32) + 0.5) / 14
    gx, gy = jnp.meshgrid(xs, xs)
    grid = jnp.broadcast_to(
        jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)[None], (r, 196, 2)
    )
    dense = head.apply(
        variables, fine_fn(grid), coarse, grid, method=head.point_logits
    ).reshape(r, 14, 14, num_classes)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(dense), rtol=1e-4, atol=1e-4
    )


def test_sample_fine_features_scale():
    feats = jnp.arange(16.0).reshape(1, 4, 4, 1)
    batch_idx = jnp.asarray([0])
    # image coords at stride 4 -> feature cell centers
    img_coords = jnp.asarray([[[4 * (2 + 0.5), 4 * (1 + 0.5)]]])
    out = sample_fine_features(feats, 0.25, batch_idx, img_coords)
    np.testing.assert_allclose(float(out[0, 0, 0]), 6.0, rtol=1e-6)
