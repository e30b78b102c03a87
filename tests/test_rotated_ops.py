"""Rotated-box ops + ROI align vs independent references.

Rotated IoU is checked against a dense rasterization reference (point-in-
rotated-box sampling on a fine grid) — fully independent of the clipping
implementation.  ROIAlign is checked against explicit bilinear math and a
constant-feature invariance; deformable conv (zero offsets) must equal a
plain convolution.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.detection.rotated_boxes import (
    box_iou_rotated,
    box_to_corners,
    nms_rotated,
    roi_align,
    roi_align_rotated,
)


def _raster_iou(b1, b2, res=400, extent=8.0):
    """Monte-Carlo-free rasterized IoU on a fine grid."""
    xs = np.linspace(-extent, extent, res)
    gx, gy = np.meshgrid(xs, xs)

    def inside(b):
        cx, cy, w, h, ang = b
        t = math.radians(ang)
        dx = gx - cx
        dy = gy - cy
        lx = dx * math.cos(t) + dy * math.sin(t)
        ly = -dx * math.sin(t) + dy * math.cos(t)
        return (np.abs(lx) <= w / 2) & (np.abs(ly) <= h / 2)

    m1, m2 = inside(b1), inside(b2)
    inter = (m1 & m2).sum()
    union = (m1 | m2).sum()
    return inter / max(union, 1)


@pytest.mark.slow  # exhaustive grids; axis-aligned test stays fast
def test_rotated_iou_identity_and_zero():
    b = jnp.asarray([[0.0, 0.0, 2.0, 1.0, 30.0]])
    iou = box_iou_rotated(b, b)
    np.testing.assert_allclose(np.asarray(iou), [[1.0]], atol=1e-5)
    far = jnp.asarray([[10.0, 10.0, 2.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(box_iou_rotated(b, far)), [[0.0]], atol=1e-6)


@pytest.mark.slow  # rasterization oracle sweep (~17 s)
def test_rotated_iou_matches_rasterization():
    rng = np.random.RandomState(0)
    boxes1 = np.stack([
        rng.uniform(-2, 2, 5), rng.uniform(-2, 2, 5),
        rng.uniform(1, 4, 5), rng.uniform(1, 4, 5),
        rng.uniform(-90, 90, 5),
    ], axis=1).astype(np.float32)
    boxes2 = np.stack([
        rng.uniform(-2, 2, 4), rng.uniform(-2, 2, 4),
        rng.uniform(1, 4, 4), rng.uniform(1, 4, 4),
        rng.uniform(-90, 90, 4),
    ], axis=1).astype(np.float32)
    ours = np.asarray(box_iou_rotated(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    for i in range(5):
        for j in range(4):
            ref = _raster_iou(boxes1[i], boxes2[j])
            assert abs(ours[i, j] - ref) < 0.02, (i, j, ours[i, j], ref)


def test_rotated_iou_axis_aligned_matches_regular():
    from ir_ads_tpu.detection.box_ops import box_iou

    a = jnp.asarray([[1.0, 1.0, 2.0, 2.0, 0.0], [0.0, 0.0, 4.0, 2.0, 0.0]])
    b = jnp.asarray([[1.5, 1.0, 2.0, 2.0, 0.0]])
    rot = box_iou_rotated(a, b)

    def to_xyxy(bx):
        return jnp.stack([
            bx[:, 0] - bx[:, 2] / 2, bx[:, 1] - bx[:, 3] / 2,
            bx[:, 0] + bx[:, 2] / 2, bx[:, 1] + bx[:, 3] / 2,
        ], -1)

    reg = box_iou(to_xyxy(a), to_xyxy(b))[0]
    np.testing.assert_allclose(np.asarray(rot), np.asarray(reg), atol=1e-5)


def test_nms_rotated_suppresses_duplicates():
    boxes = jnp.asarray([
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [0.1, 0.0, 2.0, 2.0, 5.0],   # heavy overlap with first
        [5.0, 5.0, 2.0, 2.0, 45.0],
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = nms_rotated(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])


def test_roi_align_constant_feature():
    feat = jnp.ones((1, 16, 16, 3)) * 5.0
    boxes = jnp.asarray([[0.0, 2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feat, boxes, (4, 4))
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_linear_ramp():
    """For a linear-in-x feature, ROIAlign should return exact bin-center
    x values (bilinear of a linear function is exact)."""
    h = w = 16
    xs = jnp.arange(w, dtype=jnp.float32)
    feat = jnp.broadcast_to(xs[None, None, :, None], (1, h, w, 1))
    boxes = jnp.asarray([[0.0, 2.0, 3.0, 10.0, 9.0]])  # x1=2 x2=10
    out = roi_align(feat, boxes, (2, 2), aligned=True)
    # aligned: x1-0.5=1.5, width 8 -> bins [1.5,5.5],[5.5,9.5];
    # mean of sample points = bin centers 3.5, 7.5
    np.testing.assert_allclose(
        np.asarray(out)[0, :, :, 0], [[3.5, 7.5], [3.5, 7.5]], atol=1e-4
    )


def test_roi_align_rotated_zero_angle_matches_roi_align():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    # xyxy box (2, 3) -> (10, 9) == rotated (cx 6, cy 6, w 8, h 6, 0 deg)
    xyxy = jnp.asarray([[0.0, 2.0, 3.0, 10.0, 9.0]])
    rot = jnp.asarray([[0.0, 6.0, 6.0, 8.0, 6.0, 0.0]])
    a = roi_align(feat, xyxy, (4, 4), aligned=True)
    b = roi_align_rotated(feat, rot, (4, 4))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_deform_conv_zero_offset_equals_conv():
    from ir_ads_tpu.detection.deform_conv import deform_conv2d

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 10, 12, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 8).astype(np.float32))
    offsets = jnp.zeros((2, 10, 12, 3 * 3 * 2))
    out = deform_conv2d(x, w, offsets)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_deform_conv_modulated_mask():
    from ir_ads_tpu.detection.deform_conv import deform_conv2d

    x = jnp.ones((1, 6, 6, 2))
    w = jnp.ones((3, 3, 2, 1))
    offsets = jnp.zeros((1, 6, 6, 18))
    half = jnp.full((1, 6, 6, 9), 0.5)
    out_full = deform_conv2d(x, w, offsets)
    out_half = deform_conv2d(x, w, offsets, mask=half)
    np.testing.assert_allclose(
        np.asarray(out_half), np.asarray(out_full) * 0.5, atol=1e-5
    )
