"""Checkpointing: msgpack pytree serialization with full-resume support.

Replaces the reference's dual .pth save (weights-only + full training state,
train_mm.py:183-191) with a single directory: ``weights.msgpack`` (params +
batch_stats — what inference needs) and ``train_state.msgpack`` (optimizer
state, step, best metric) plus a JSON manifest.  No pickle: the format is
flax.serialization msgpack bytes, portable across hosts.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def save_weights(path: str, params: Any, batch_stats: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": params, "batch_stats": batch_stats}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_weights(path: str, template: Any) -> Any:
    """template: {'params': ..., 'batch_stats': ...} pytree to fill."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def save_checkpoint(
    directory: str,
    state,
    best_miou: float = 0.0,
    epoch: int = 0,
    extra: Optional[Dict] = None,
) -> None:
    os.makedirs(directory, exist_ok=True)
    save_weights(
        os.path.join(directory, "weights.msgpack"), state.params, state.batch_stats
    )
    with open(os.path.join(directory, "train_state.msgpack"), "wb") as f:
        f.write(
            serialization.to_bytes(
                {"opt_state": state.opt_state, "step": state.step}
            )
        )
    manifest = {"best_miou": best_miou, "epoch": epoch, **(extra or {})}
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_checkpoint(directory: str, state) -> Tuple[Any, Dict]:
    """Restore a TrainState (params/batch_stats/opt_state/step) + manifest."""
    weights = load_weights(
        os.path.join(directory, "weights.msgpack"),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    with open(os.path.join(directory, "train_state.msgpack"), "rb") as f:
        train = serialization.from_bytes(
            {"opt_state": state.opt_state, "step": state.step}, f.read()
        )
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    state = state.replace(
        params=weights["params"],
        batch_stats=weights["batch_stats"],
        opt_state=train["opt_state"],
        step=train["step"],
    )
    return state, manifest
