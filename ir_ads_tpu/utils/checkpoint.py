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


class PeriodicCheckpointer:
    """Periodic checkpoints with retention (d2 PeriodicCheckpointer,
    engine/hooks.py: period + max_to_keep)."""

    def __init__(self, directory: str, period: int, max_to_keep: int = 3):
        self.directory = directory
        self.period = period
        self.max_to_keep = max_to_keep
        self._kept = []

    def step(self, state, step: int, **extra) -> Optional[str]:
        if self.period <= 0 or (step + 1) % self.period:
            return None
        path = os.path.join(self.directory, f"ckpt_{step + 1:08d}")
        save_checkpoint(path, state, epoch=step + 1, extra=extra)
        self._kept.append(path)
        while len(self._kept) > self.max_to_keep:
            old = self._kept.pop(0)
            try:
                import shutil

                shutil.rmtree(old)
            except OSError:
                pass
        return path
