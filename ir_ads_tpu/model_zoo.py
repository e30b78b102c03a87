"""Model zoo: name -> shipped config -> built model (reference
detectron2/detectron2/model_zoo/model_zoo.py:1-213).

The reference maps config names to S3 checkpoint URLs and builds torch
models.  This environment has no egress, so the TPU-native zoo maps names
to the repo's shipped configs and resolves *local* checkpoints from
``IR_ADS_ZOO_DIR`` (default ``~/.cache/ir_ads_zoo``) — the same role
`_ModelZooUrls` + DetectionCheckpointer play upstream.  Checkpoints are the
repo's msgpack format (utils/checkpoint.py); PyTorch ``.pth`` files are
imported transparently via utils/torch_import.py.

API surface mirrored: ``get_config_file``, ``get_config``,
``get_checkpoint_path`` (≙ get_checkpoint_url), ``get``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> (relative config path, kind); kinds: "semseg" (YAML + CMNeXt
# family), "detection" (python lazy config with a ``model`` node)
_ZOO: Dict[str, Tuple[str, str]] = {
    # semseg (reference configs/*.yaml)
    "NYU-RGBD/CMNeXt-SwinB": ("configs/nyu_rgbd.yaml", "semseg"),
    "SUN-RGBD/CMNeXt-SwinB": ("configs/sun_rgbd.yaml", "semseg"),
    "MFNet-RGBT/CMNeXt-SwinB": ("configs/mfnet_rgbt.yaml", "semseg"),
    "PST-RGBT/CMNeXt-SwinB": ("configs/pst_rgbt.yaml", "semseg"),
    "DELIVER-RGBDEL/CMNeXt-SwinB": ("configs/deliver_rgbdel.yaml", "semseg"),
    "MCubeS-RGBADN/CMNeXt-SwinB": ("configs/mcubes_rgbadn.yaml", "semseg"),
    "DeepCrack-RGB/CMNeXt-SwinB": ("configs/deepcrack_rgb.yaml", "semseg"),
    # detection (reference projects/vCLR_deformable_mask/configs)
    "COCO-OpenSet/DINO-R50-vCLR": (
        "configs/detection/deformable_train_voc_eval_nonvoc.py",
        "detection",
    ),
    "LVIS-OpenSet/DINO-R50-vCLR": (
        "configs/detection/deformable_train_coco_eval_lvis.py",
        "detection",
    ),
}


def zoo_dir() -> str:
    return os.environ.get(
        "IR_ADS_ZOO_DIR", os.path.expanduser("~/.cache/ir_ads_zoo")
    )


def get_config_file(name: str) -> str:
    """Absolute path of the shipped config for a zoo name."""
    if name not in _ZOO:
        raise RuntimeError(
            f"{name!r} is not in the model zoo. Known: {sorted(_ZOO)}"
        )
    rel, _ = _ZOO[name]
    path = os.path.join(_REPO_ROOT, rel)
    if not os.path.exists(path):
        raise RuntimeError(f"zoo config missing on disk: {path}")
    return path


def get_config(name: str, overrides: Optional[list] = None) -> Dict[str, Any]:
    """Load the config for a zoo name (YAML dict or lazy-config dict)."""
    path = get_config_file(name)
    _, kind = _ZOO[name]
    if kind == "semseg":
        from ir_ads_tpu.utils.config import load_config

        return load_config(path)
    from ir_ads_tpu.utils.lazy_config import load_py_config

    cfg = load_py_config(path, overrides or [])
    if "model" not in cfg:
        # recipe configs hold train/eval knobs; the model node lives in the
        # shared base (reference get_config composition, detrex config.py)
        base = load_py_config(
            os.path.join(_REPO_ROOT, "configs/detection/dino_r50.py"), []
        )
        cfg = dict(base, **cfg)
    return cfg


def get_checkpoint_path(name: str) -> str:
    """Local checkpoint path for a zoo name (≙ get_checkpoint_url).

    Layout: <IR_ADS_ZOO_DIR>/<name>/ is a msgpack checkpoint directory, or
    <IR_ADS_ZOO_DIR>/<name>.pth a torch state_dict to import."""
    safe = name.replace("/", "_")
    root = zoo_dir()
    for cand in (os.path.join(root, safe), os.path.join(root, safe + ".pth")):
        if os.path.exists(cand):
            return cand
    raise RuntimeError(
        f"no local checkpoint for {name!r} under {root} "
        f"(expected {safe}/ msgpack dir or {safe}.pth; this build has no "
        f"network egress, place files there manually)"
    )


def get(name: str, trained: bool = False):
    """Build the zoo model; returns (module, variables).

    variables is None for trained=False (caller runs module.init), else the
    loaded/imported checkpoint pytree."""
    cfg = get_config(name)
    _, kind = _ZOO[name]
    if kind == "semseg":
        from ir_ads_tpu.data.datasets import get_dataset
        from ir_ads_tpu.models import build_model

        mc, dc = cfg["MODEL"], cfg["DATASET"]
        n_cls = len(get_dataset(dc["NAME"]).CLASSES)
        module = build_model(mc.get("NAME", "CMNeXt"), mc["BACKBONE"], n_cls)
    else:
        from ir_ads_tpu.utils.lazy_config import instantiate

        module = instantiate(cfg["model"])
    variables = None
    if trained:
        path = get_checkpoint_path(name)
        if path.endswith(".pth"):
            from ir_ads_tpu.utils.torch_import import import_torch_checkpoint

            variables = import_torch_checkpoint(path, module)
        else:
            from ir_ads_tpu.utils.checkpoint import load_checkpoint

            variables = load_checkpoint(path)
    return module, variables
