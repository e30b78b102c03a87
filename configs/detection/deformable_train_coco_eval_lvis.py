"""COCO-train -> LVIS-eval open-set variant (reference
configs/dino-resnet/deformable_train_coco_eval_lvis.py)."""

train = dict(
    max_iter=60000,
    batch_size=16,
    lr=1e-4,
    backbone_mult=0.1,
    clip_norm=0.1,
    ema_decay=0.999,
    image_size=512,
    class_ids=None,  # all COCO classes
)

eval_cfg = dict(
    class_agnostic=True,
    # LVIS federated evaluation (ir_ads_tpu.detection.lvis_eval
    # .LVISEvaluator): per-image neg_category_ids /
    # not_exhaustive_category_ids semantics, APr/APc/APf buckets —
    # matching d2 evaluation/lvis_evaluation.py, NOT a COCO-json shim.
    evaluator="lvis",
    max_dets=(1, 10, 20, 30, 50, 100, 300, 900),
)
