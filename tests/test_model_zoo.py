"""Model zoo registry (reference model_zoo/model_zoo.py API surface)."""

import pytest

from ir_ads_tpu import model_zoo


def test_get_config_file_and_config():
    path = model_zoo.get_config_file("NYU-RGBD/CMNeXt-SwinB")
    assert path.endswith("configs/nyu_rgbd.yaml")
    cfg = model_zoo.get_config("NYU-RGBD/CMNeXt-SwinB")
    assert cfg["MODEL"]["BACKBONE"].startswith("SwinTransformer")


def test_unknown_name_raises():
    with pytest.raises(RuntimeError, match="not in the model zoo"):
        model_zoo.get_config_file("nope/never")


def test_get_builds_semseg_model():
    module, variables = model_zoo.get("NYU-RGBD/CMNeXt-SwinB", trained=False)
    assert variables is None
    assert module.num_classes == 40


def test_get_builds_detection_model():
    module, _ = model_zoo.get("COCO-OpenSet/DINO-R50-vCLR", trained=False)
    assert module is not None


def test_checkpoint_path_missing_is_clear(tmp_path, monkeypatch):
    monkeypatch.setenv("IR_ADS_ZOO_DIR", str(tmp_path))
    with pytest.raises(RuntimeError, match="no local checkpoint"):
        model_zoo.get_checkpoint_path("NYU-RGBD/CMNeXt-SwinB")
