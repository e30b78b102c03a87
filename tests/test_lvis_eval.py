"""LVIS federated evaluation semantics (reference d2
evaluation/lvis_evaluation.py + the `lvis` package's LVISEval rules)."""

import numpy as np

from ir_ads_tpu.detection.coco_eval import COCOEvaluator
from ir_ads_tpu.detection.lvis_eval import LVISEvaluator


BOX = np.asarray([[10.0, 10.0, 20.0, 20.0]])  # xywh


def test_federated_unverified_image_not_false_positive():
    """A detection of category 2 on an image where cat 2 is neither
    annotated nor in neg_category_ids must NOT count as a false positive —
    the same prediction DOES hurt AP under plain COCO rules."""

    def feed(ev, lvis):
        # image 1: gt of cat 2, perfect detection
        kw = dict(
            pred_boxes=BOX, pred_scores=np.asarray([0.9]),
            pred_labels=np.asarray([2]),
            gt_boxes=BOX, gt_labels=np.asarray([2]),
        )
        ev.add_image(**kw)
        # image 2: no gt for cat 2, spurious high-scoring detection
        kw2 = dict(
            pred_boxes=BOX + 100, pred_scores=np.asarray([0.95]),
            pred_labels=np.asarray([2]),
            gt_boxes=np.zeros((0, 4)), gt_labels=np.zeros((0,), np.int64),
        )
        if lvis:
            kw2["neg_category_ids"] = ()  # cat 2 NOT verified absent
        ev.add_image(**kw2)

    coco = COCOEvaluator()
    feed(coco, lvis=False)
    lvis = LVISEvaluator()
    feed(lvis, lvis=True)
    ap_coco = coco.summarize()["AP"]
    ap_lvis = lvis.summarize()["AP"]
    assert ap_lvis > 0.99  # federated: spurious det dropped
    assert ap_coco < 0.99  # COCO: it is a false positive


def test_neg_category_makes_it_a_false_positive():
    ev = LVISEvaluator()
    ev.add_image(
        pred_boxes=BOX, pred_scores=np.asarray([0.9]),
        pred_labels=np.asarray([2]),
        gt_boxes=BOX, gt_labels=np.asarray([2]),
    )
    ev.add_image(
        pred_boxes=BOX + 100, pred_scores=np.asarray([0.95]),
        pred_labels=np.asarray([2]),
        gt_boxes=np.zeros((0, 4)), gt_labels=np.zeros((0,), np.int64),
        neg_category_ids=(2,),  # verified absent -> detection is FP
    )
    assert ev.summarize()["AP"] < 0.99


def test_not_exhaustive_ignores_unmatched():
    ev = LVISEvaluator()
    # gt for cat 1 exists but annotation is not exhaustive; an extra
    # detection elsewhere must be ignored, not an FP
    ev.add_image(
        pred_boxes=np.concatenate([BOX, BOX + 100]),
        pred_scores=np.asarray([0.9, 0.95]),
        pred_labels=np.asarray([1, 1]),
        gt_boxes=BOX, gt_labels=np.asarray([1]),
        not_exhaustive_category_ids=(1,),
    )
    assert ev.summarize()["AP"] > 0.99


def test_frequency_buckets():
    freqs = {1: "r", 2: "f"}
    ev = LVISEvaluator(category_frequencies=freqs)
    for cat, good in ((1, True), (2, False)):
        ev.add_image(
            pred_boxes=BOX if good else BOX + 50,
            pred_scores=np.asarray([0.9]),
            pred_labels=np.asarray([cat]),
            gt_boxes=BOX, gt_labels=np.asarray([cat]),
        )
    s = ev.summarize()
    assert s["APr"] > 0.99  # rare cat detected perfectly
    assert s["APf"] < 0.01  # frequent cat missed
