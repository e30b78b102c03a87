"""Open-set recipe: train on the VOC subset of COCO, evaluate class-agnostic
AR@{1..900} on non-VOC categories (reference
configs/dino-resnet/deformable_train_voc_eval_nonvoc.py:27-158).

Use with train_net.py flags or load via
ir_ads_tpu.utils.lazy_config.load_py_config + dotted overrides.
"""

# COCO category ids of the 20 VOC classes
VOC_COCO_IDS = [1, 2, 3, 4, 5, 6, 7, 9, 15, 16, 17, 18, 19, 20, 40, 57, 58,
                59, 61, 63]

train = dict(
    max_iter=60000,
    batch_size=16,
    lr=1e-4,
    backbone_mult=0.1,
    clip_norm=0.1,
    ema_decay=0.999,
    eval_period=5000,
    image_size=512,
    class_ids=VOC_COCO_IDS,  # train on VOC subset
)

eval_cfg = dict(
    class_agnostic=True,  # open-set proposal evaluation
    exclude_class_ids=VOC_COCO_IDS,  # evaluate on non-VOC GT
    max_dets=(1, 10, 20, 30, 50, 100, 300, 900),
)
