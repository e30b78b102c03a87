"""YAML config loading (reference train_mm.py:207-213 uses yaml+argparse).

The schema mirrors the reference's configs/*.yaml so users can bring their
configs across unchanged; model/dataset names resolve through explicit
registries (ir_ads_tpu.data.datasets.DATASETS, models) instead of ``eval()``.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import yaml

DEFAULTS: Dict[str, Any] = {
    "DEVICE": "tpu",
    "SAVE_DIR": "output",
    "MODEL": {
        "NAME": "CMNeXt",
        "BACKBONE": "SwinTransformer-B",
        "PRETRAINED": "",
        "RESUME": "",
    },
    "DATASET": {
        "NAME": "NYU",
        "ROOT": "data/NYUDepthv2",
        "IGNORE_LABEL": 255,
        "MODALS": ["img", "depth"],
    },
    "TRAIN": {
        "IMAGE_SIZE": [480, 640],
        "BATCH_SIZE": 4,
        "EPOCHS": 400,
        "EVAL_START": 200,
        "EVAL_INTERVAL": 1,
        "AMP": True,  # bf16 compute on TPU
        "DDP": False,  # ignored: data-axis sharding is always on
    },
    "LOSS": {"NAME": "CrossEntropy", "CLS_WEIGHTS": False},
    "OPTIMIZER": {
        "NAME": "adamw",
        "LR": 4e-4,
        "WEIGHT_DECAY": 0.01,
        "TRAIN_TYPE": "Adapter",
    },
    "SCHEDULER": {
        "NAME": "warmuppolylr",
        "POWER": 0.9,
        "WARMUP": 10,
        "WARMUP_RATIO": 0.1,
    },
    "EVAL": {
        "MODEL_PATH": "",
        "IMAGE_SIZE": [480, 640],
        "BATCH_SIZE": 1,
        "MSF": {
            "ENABLE": False,
            "FLIP": True,
            "SCALES": [0.5, 0.75, 1.0, 1.25, 1.5, 1.75],
        },
    },
}


def _merge(base: Dict, override: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in (override or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        user = yaml.safe_load(f) or {}
    return _merge(DEFAULTS, user)
