"""End-to-end learnability: the full train_mm stack (augmentations, MMST
3-head loss, AdamW+warmup-poly, functional BN) must learn a color->class
mapping far above chance on block-structured synthetic data."""

import numpy as np
import yaml
import pytest

pytestmark = pytest.mark.slow  # model-level: compile-dominated


def test_train_mm_learns(tmp_path):
    import train_mm
    from ir_ads_tpu.utils.config import load_config

    cfg = load_config("configs/synthetic_smoke.yaml")
    cfg["DATASET"]["ROOT"] = "learnable"
    cfg["TRAIN"]["EPOCHS"] = 8
    cfg["TRAIN"]["EVAL_START"] = 0
    cfg["SAVE_DIR"] = str(tmp_path)
    best = train_mm.main(cfg, tmp_path)
    # 8 classes -> chance mIoU ~6-7; learning pushes well past it
    assert best > 20.0, best
