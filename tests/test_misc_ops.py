"""VQ quantizer + detection transforms."""

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.detection.transforms import (
    color_aug_ssd,
    random_flip,
    resize_shortest_edge,
)
from ir_ads_tpu.ops.quantize import vq_init, vq_lookup, vq_update


def test_vq_reduces_distortion_and_reassigns_dead_codes():
    key = jax.random.PRNGKey(0)
    state = vq_init(key, num_codes=8, dim=2)
    centers = jnp.asarray([[2.0, 2.0], [-2.0, 2.0], [2.0, -2.0], [-2.0, -2.0]])

    def distortion(state, pts):
        _, q = vq_lookup(state, pts)
        return float(jnp.mean(jnp.sum((q - pts) ** 2, -1)))

    k1, k2, key = jax.random.split(key, 3)
    probe = centers[jax.random.randint(k1, (256,), 0, 4)] + 0.1 * (
        jax.random.normal(k2, (256, 2))
    )
    d0 = distortion(state, probe)
    for i in range(150):
        k1, k2, k3, key = jax.random.split(key, 4)
        pts = centers[jax.random.randint(k1, (128,), 0, 4)]
        pts = pts + 0.1 * jax.random.normal(k2, pts.shape)
        codes, quant, state = vq_update(state, pts, k3, decay=0.9)
    d1 = distortion(state, probe)
    assert d1 < d0 * 0.1, (d0, d1)  # distortion collapses onto clusters

    # dead-code reassignment: a code far away with zero usage jumps into
    # the data support
    far = state._replace(
        codebook=state.codebook.at[0].set(jnp.asarray([100.0, 100.0])),
        ema_count=state.ema_count.at[0].set(0.0),
    )
    _, _, new = vq_update(far, probe, jax.random.PRNGKey(5), decay=0.9)
    assert float(jnp.linalg.norm(new.codebook[0])) < 10.0

    # straight-through gradient passes through
    g = jax.grad(lambda x: jnp.sum(vq_lookup(state, x)[1] ** 2))(centers)
    assert np.abs(np.asarray(g)).sum() > 0


def test_resize_shortest_edge_and_flip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 200, 3), dtype=np.uint8).astype(np.uint8)
    boxes = np.asarray([[10, 10, 50, 60]], np.float32)
    out, b = resize_shortest_edge(img, boxes, short=50)
    assert out.shape[:2] == (50, 100)
    np.testing.assert_allclose(b, boxes * 0.5)
    # max_size cap
    out2, _ = resize_shortest_edge(img, None, short=800, max_size=400)
    assert max(out2.shape[:2]) == 400

    class AlwaysFlip:
        def random(self):
            return 0.0

    f, fb = random_flip(out, b, AlwaysFlip(), p=0.5)
    np.testing.assert_allclose(fb[0], [100 - 25, 5, 100 - 5, 30])


def test_color_aug_ssd_shape_and_range():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8).astype(np.uint8)
    out = color_aug_ssd(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8
