"""RetinaNet / FCOS / Faster R-CNN meta-arch tests: forward shapes, finite
losses, anchor matcher semantics, delta encode/decode roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.detection.meta_arch import (
    FCOS,
    FasterRCNN,
    RetinaNet,
    decode_deltas,
    encode_deltas,
    make_anchors,
    match_anchors,
)


pytestmark = pytest.mark.slow  # model-level: compile-dominated

def test_delta_roundtrip():
    rng = np.random.RandomState(0)
    anchors = rng.rand(10, 4).astype(np.float32) * 50
    anchors[:, 2:] = anchors[:, :2] + 10 + rng.rand(10, 2) * 40
    boxes = rng.rand(10, 4).astype(np.float32) * 50
    boxes[:, 2:] = boxes[:, :2] + 5 + rng.rand(10, 2) * 30
    d = encode_deltas(jnp.asarray(anchors), jnp.asarray(boxes))
    back = decode_deltas(jnp.asarray(anchors), d)
    np.testing.assert_allclose(np.asarray(back), boxes, atol=1e-3)


def test_match_anchors_semantics():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [100, 100, 110, 110], [0, 0, 9, 9]], jnp.float32
    )
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    valid = jnp.asarray([True])
    matched, label = match_anchors(anchors, gt, valid, 0.5, 0.4)
    assert int(label[0]) == 1  # exact match
    assert int(label[1]) == 0  # no overlap -> negative
    assert int(matched[0]) == 0


def test_anchor_count():
    anchors = make_anchors(((4, 4), (2, 2)), (8, 16), (32, 64))
    assert anchors.shape == ((16 + 4) * 9, 4)


@pytest.mark.parametrize("arch", ["retinanet", "fcos", "rcnn"])
def test_meta_arch_forward_and_losses(arch):
    cls = {"retinanet": RetinaNet, "fcos": FCOS, "rcnn": FasterRCNN}[arch]
    m = cls(num_classes=5, backbone_arch="resnet18", channels=32, max_gt=3,
            **({"num_proposals": 16} if arch == "rcnn" else {}))
    imgs = jnp.ones((2, 64, 64, 3))
    gt_boxes = jnp.asarray(
        [[[4, 4, 24, 24], [30, 30, 60, 60], [0, 0, 0, 0]]] * 2, jnp.float32
    )
    gt_labels = jnp.asarray([[1, 2, 0]] * 2, jnp.int32)
    gt_valid = jnp.asarray([[True, True, False]] * 2)
    v = m.init({"params": jax.random.PRNGKey(0)}, imgs, gt_boxes, gt_labels,
               gt_valid, train=True)
    out, _ = m.apply(v, imgs, gt_boxes, gt_labels, gt_valid, train=True,
                     mutable=["batch_stats"])
    assert "losses" in out
    for k, val in out["losses"].items():
        assert np.isfinite(float(val)), (k, val)
    # eval
    out_e = m.apply(v, imgs, train=False)
    assert bool(jnp.isfinite(out_e["boxes"]).all())


def test_retinanet_loss_decreases_on_perfect_logits():
    """Sanity: loss with perfect box targets < random."""
    m = RetinaNet(num_classes=3, backbone_arch="resnet18", channels=32, max_gt=2)
    imgs = jnp.ones((1, 64, 64, 3))
    gt_boxes = jnp.asarray([[[8, 8, 40, 40], [0, 0, 0, 0]]], jnp.float32)
    gt_labels = jnp.asarray([[1, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, False]])
    v = m.init({"params": jax.random.PRNGKey(0)}, imgs, gt_boxes, gt_labels,
               gt_valid, train=True)
    out, _ = m.apply(v, imgs, gt_boxes, gt_labels, gt_valid, train=True,
                     mutable=["batch_stats"])
    assert float(out["losses"]["loss_cls"]) > 0
