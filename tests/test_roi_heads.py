"""Mask/Keypoint R-CNN ROI heads (reference detectron2
modeling/roi_heads/{mask_head,keypoint_head}.py, layers/mask_ops.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.detection.meta_arch import KeypointRCNN, MaskRCNN
from ir_ads_tpu.detection.roi_heads import (
    KeypointHead,
    MaskHead,
    crop_and_resize_masks,
    heatmaps_to_keypoints,
    keypoint_rcnn_loss,
    keypoints_to_heatmap,
    mask_rcnn_inference,
    mask_rcnn_loss,
    paste_masks_in_image,
)


def test_mask_head_shapes():
    head = MaskHead(num_classes=5, conv_dim=16, num_conv=2)
    x = jnp.zeros((3, 14, 14, 32))
    v = head.init(jax.random.PRNGKey(0), x)
    y = head.apply(v, x)
    assert y.shape == (3, 28, 28, 5)


def test_keypoint_head_shapes():
    head = KeypointHead(num_keypoints=17, conv_dims=(32, 32))
    x = jnp.zeros((2, 14, 14, 16))
    v = head.init(jax.random.PRNGKey(0), x)
    y = head.apply(v, x)
    assert y.shape == (2, 56, 56, 17)


def test_crop_and_resize_full_box_identity():
    """Cropping a mask by the full-image box resamples the whole mask."""
    m, h, w = 2, 16, 16
    masks = np.zeros((m, h, w), np.float32)
    masks[0, :8] = 1.0  # top half
    boxes = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
    tgt = crop_and_resize_masks(
        jnp.asarray(masks), boxes, jnp.asarray([0]), 8
    )
    assert tgt.shape == (1, 8, 8)
    got = np.asarray(tgt)
    assert got[0, :3].mean() > 0.9  # top rows on
    assert got[0, -3:].mean() < 0.1  # bottom rows off


def test_mask_rcnn_loss_perfect_prediction_low():
    r, s, c = 4, 8, 3
    tgt = jnp.asarray(
        (np.random.RandomState(0).rand(r, s, s) > 0.5).astype(np.float32)
    )
    cls = jnp.asarray([0, 1, 2, 0])
    fg = jnp.ones((r,))
    good = jnp.zeros((r, s, s, c)).at[..., :].set(-20.0)
    for i in range(r):
        good = good.at[i, :, :, cls[i]].set(
            jnp.where(tgt[i] > 0.5, 20.0, -20.0)
        )
    bad = -good
    l_good = float(mask_rcnn_loss(good, cls, tgt, fg))
    l_bad = float(mask_rcnn_loss(bad, cls, tgt, fg))
    assert l_good < 1e-6 and l_bad > 5.0


def test_mask_inference_selects_class_channel():
    logits = jnp.stack(
        [jnp.full((2, 4, 4), -5.0), jnp.full((2, 4, 4), 5.0)], axis=-1
    )
    probs = mask_rcnn_inference(logits, jnp.asarray([1, 0]))
    assert float(probs[0].mean()) > 0.99  # roi 0 picked channel 1 (+5)
    assert float(probs[1].mean()) < 0.01  # roi 1 picked channel 0 (-5)


def test_keypoints_heatmap_roundtrip():
    """to_heatmap -> argmax decode recovers the keypoint's heatmap cell."""
    rois = jnp.asarray([[10.0, 20.0, 74.0, 84.0]])  # 64x64 box
    kps = jnp.asarray([[[42.0, 52.0, 2.0], [0.0, 0.0, 0.0]]])  # 1 visible
    lin, valid = keypoints_to_heatmap(kps, rois, 56)
    assert valid.tolist() == [[1, 0]]
    # build logits peaking at the encoded cell, decode back
    logits = jnp.full((1, 56, 56, 2), -10.0)
    yi, xi = int(lin[0, 0]) // 56, int(lin[0, 0]) % 56
    logits = logits.at[0, yi, xi, 0].set(10.0)
    out = heatmaps_to_keypoints(logits, rois)
    x, y = float(out[0, 0, 0]), float(out[0, 0, 1])
    # decoded continuous coordinate lies within one heatmap cell of the gt
    cell_w = 64.0 / 56
    assert abs(x - 42.0) <= cell_w and abs(y - 52.0) <= cell_w


def test_keypoint_loss_prefers_correct_peak():
    rois = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])
    kps = jnp.asarray([[[28.0, 28.0, 2.0]]])
    lin, _ = keypoints_to_heatmap(kps, rois, 56)
    good = jnp.full((1, 56, 56, 1), 0.0)
    yi, xi = int(lin[0, 0]) // 56, int(lin[0, 0]) % 56
    good = good.at[0, yi, xi, 0].set(15.0)
    bad = jnp.full((1, 56, 56, 1), 0.0).at[0, 0, 0, 0].set(15.0)
    fg = jnp.ones((1,))
    assert float(keypoint_rcnn_loss(good, kps, rois, fg)) < 0.01
    assert float(keypoint_rcnn_loss(bad, kps, rois, fg)) > 5.0


def test_paste_masks_places_mask_in_box():
    masks = jnp.ones((1, 8, 8))
    boxes = jnp.asarray([[4.0, 6.0, 12.0, 14.0]])
    out = np.asarray(paste_masks_in_image(masks, boxes, (20, 20)))
    assert out[0, 7, 7]  # inside box
    assert not out[0, 1, 1]  # far outside
    assert not out[0, 18, 18]


@pytest.mark.slow
def test_mask_rcnn_trains_one_step():
    model = MaskRCNN(
        num_classes=3, backbone_arch="resnet18", num_proposals=16,
        max_gt=4, mask_pool=7,
    )
    b, h, w = 1, 64, 64
    images = jnp.zeros((b, h, w, 3))
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]] * 4])
    gt_labels = jnp.zeros((b, 4), jnp.int32)
    gt_valid = jnp.asarray([[True, False, False, False]])
    gt_masks = jnp.ones((b, 4, h, w), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), images, gt_boxes, gt_labels, gt_valid,
        train=True, gt_masks=gt_masks,
    )
    assert "mask_head" in variables["params"]

    def loss_fn(params):
        out = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            images, gt_boxes, gt_labels, gt_valid, train=True,
            gt_masks=gt_masks,
        )
        return sum(jax.tree_util.tree_leaves(out["losses"]))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert bool(jnp.isfinite(loss))
    gm = grads["mask_head"]
    assert any(
        float(jnp.sum(jnp.abs(leaf))) > 0
        for leaf in jax.tree_util.tree_leaves(gm)
    )


@pytest.mark.slow
def test_keypoint_rcnn_forward():
    model = KeypointRCNN(
        backbone_arch="resnet18", num_proposals=8, max_gt=2, mask_pool=7,
    )
    images = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), images)
    out = model.apply(variables, images)
    assert out["keypoint_logits"].shape == (1, 8, 28, 28, 17)
