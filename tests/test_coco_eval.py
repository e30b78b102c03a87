"""COCO evaluator tests: C++ kernels vs python reference, RLE codec, and
known-answer AP/AR cases."""

import numpy as np
import pytest

from ir_ads_tpu.detection.coco_eval import (
    COCOEvaluator,
    bbox_iou_xywh,
    match_image,
    match_image_py,
    _load_native,
)
from ir_ads_tpu.detection.rle import decode_rle, encode_rle


def test_native_library_builds():
    assert _load_native(), "C++ cocoeval failed to build"


def test_bbox_iou_known_values():
    dt = np.asarray([[0, 0, 10, 10], [5, 5, 10, 10]], float)
    gt = np.asarray([[0, 0, 10, 10]], float)
    iou = bbox_iou_xywh(dt, gt)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[1, 0], 25.0 / 175.0)
    # crowd: union = dt area
    iou_c = bbox_iou_xywh(dt, gt, np.asarray([1], np.uint8))
    np.testing.assert_allclose(iou_c[1, 0], 25.0 / 100.0)


def test_match_cpp_equals_python():
    rng = np.random.RandomState(0)
    for trial in range(10):
        n_dt, n_gt = rng.randint(1, 12), rng.randint(1, 8)
        ious = rng.rand(n_dt, n_gt)
        gi = np.zeros(n_gt, np.uint8)
        gi[rng.rand(n_gt) < 0.3] = 1
        # ignored gts must be sorted last (evaluator does this)
        order = np.argsort(gi, kind="mergesort")
        gi = gi[order]
        gc = np.zeros(n_gt, np.uint8)
        gc[(rng.rand(n_gt) < 0.2) & (gi == 1)] = 1
        a = match_image(ious, gi, gc)
        b = match_image_py(ious, gi, gc)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_perfect_detection_ap1():
    ev = COCOEvaluator()
    gt = np.asarray([[10, 10, 20, 20], [50, 50, 30, 30]], float)
    labels = np.asarray([0, 1])
    ev.add_image(gt, np.asarray([0.9, 0.8]), labels, gt, labels)
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR@1"] == pytest.approx(1.0)
    assert stats["AR@900"] == pytest.approx(1.0)


def test_half_detections_missing():
    ev = COCOEvaluator()
    gt = np.asarray([[10, 10, 20, 20], [100, 100, 20, 20]], float)
    labels = np.asarray([0, 0])
    # only first GT detected
    ev.add_image(
        gt[:1], np.asarray([0.9]), labels[:1], gt, labels
    )
    stats = ev.summarize()
    assert stats["AR@100"] == pytest.approx(0.5)
    # AP: precision 1.0 up to recall 0.5, 0 beyond -> ~0.5 (101-pt interp)
    assert 0.45 < stats["AP"] < 0.55


def test_false_positive_lowers_ap():
    ev = COCOEvaluator()
    gt = np.asarray([[10, 10, 20, 20]], float)
    labels = np.asarray([0])
    preds = np.asarray([[200, 200, 20, 20], [10, 10, 20, 20]], float)
    # FP has HIGHER score than the TP
    ev.add_image(preds, np.asarray([0.9, 0.8]), np.asarray([0, 0]), gt, labels)
    stats = ev.summarize()
    assert stats["AR@100"] == pytest.approx(1.0)
    assert stats["AP"] < 0.6  # precision at recall 1.0 is 0.5


def test_ar_at_k_ordering():
    """AR@1 <= AR@10 when many GTs and one detection slot."""
    ev = COCOEvaluator()
    gt = np.stack([[10 + 40 * i, 10, 20, 20] for i in range(5)]).astype(float)
    labels = np.zeros(5, int)
    ev.add_image(gt, np.linspace(0.9, 0.5, 5), labels, gt, labels)
    stats = ev.summarize()
    assert stats["AR@1"] == pytest.approx(1.0 / 5.0, abs=1e-6)
    assert stats["AR@10"] == pytest.approx(1.0)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(13, 17) > 0.6).astype(np.uint8)
    rle = encode_rle(mask)
    back = decode_rle(rle)
    np.testing.assert_array_equal(back, mask)


def _rle_to_string(counts):
    """Independent reimplementation of pycocotools rleToString (the inverse
    of the decoder under test)."""
    s = bytearray()
    for i, cnt in enumerate(counts):
        x = int(cnt)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(c + 48)
    return bytes(s)


def test_rle_compressed_decode():
    from ir_ads_tpu.detection.rle import _decode_compressed_counts

    rng = np.random.RandomState(3)
    for _ in range(5):
        mask = (rng.rand(11, 7) > 0.5).astype(np.uint8)
        rle = encode_rle(mask)
        s = _rle_to_string(rle["counts"])
        assert _decode_compressed_counts(s) == list(rle["counts"])
        compressed = {"counts": s, "size": rle["size"]}
        np.testing.assert_array_equal(decode_rle(compressed), mask)


def test_mask_iou_and_segm_metrics():
    from ir_ads_tpu.detection.coco_eval import mask_iou

    a = np.zeros((1, 8, 8), np.uint8)
    a[0, :4, :4] = 1
    b = np.zeros((2, 8, 8), np.uint8)
    b[0, :4, :4] = 1          # identical
    b[1, 2:6, 2:6] = 1        # 4/28 overlap
    iou = mask_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 4.0 / 28.0)

    ev = COCOEvaluator()
    gt_boxes = np.asarray([[0, 0, 4, 4]], float)
    labels = np.asarray([0])
    masks = a.astype(np.float32)
    ev.add_image(gt_boxes, np.asarray([0.9]), labels, gt_boxes, labels,
                 pred_masks=masks, gt_masks=masks)
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["segm_AP"] == pytest.approx(1.0)

    # wrong mask, right box -> segm AP drops, bbox AP stays
    ev2 = COCOEvaluator()
    wrong = np.zeros_like(masks)
    wrong[0, 6:8, 6:8] = 1
    ev2.add_image(gt_boxes, np.asarray([0.9]), labels, gt_boxes, labels,
                  pred_masks=wrong, gt_masks=masks)
    s2 = ev2.summarize()
    assert s2["AP"] == pytest.approx(1.0)
    assert s2["segm_AP"] == pytest.approx(0.0)
