"""Optimizers and LR schedules (reference semseg/{optimizers,schedulers}.py)
expressed as optax transforms.

The reference's ``TRAIN_TYPE: Adapter`` freeze (optimizers.py:7-31) — train
only parameters whose name contains Adapter / extra_patch_embed / head / MPG
— becomes an optax mask: frozen parameters get zero updates, so the optimizer
state for them is never materialized (optax.masked), and gradients for them
are discarded.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

# Substrings that mark trainable params in adapter-finetune mode.  Mirrors
# the reference's name filter (Adapter|extra_patch_embed|head|MPG); our
# module names are adapter_* / extra_patch_embed / decode_head* / mpg_* /
# deform_mpg_* — the deform blocks correspond to the reference's
# "DeformMPGBlocks" (matched by 'MPG' there).
ADAPTER_PATTERNS = ("adapter", "extra_patch_embed", "head", "mpg")


def adapter_mask(params: Any) -> Any:
    """Pytree of bools: True = trainable under adapter-only finetuning."""

    def path_trainable(path) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(k) for k in keys).lower()
        return any(pat in joined for pat in ADAPTER_PATTERNS)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: path_trainable(path), params
    )


def warmup_poly_schedule(
    base_lr: float,
    max_iter: int,
    power: float = 0.9,
    warmup_iter: int = 0,
    warmup_ratio: float = 0.1,
) -> optax.Schedule:
    """WarmupPolyLR with linear warmup (reference schedulers.py:45-56, built
    via get_scheduler with warmup='linear', schedulers.py:93)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha_w = step / jnp.maximum(warmup_iter, 1)
        warm = warmup_ratio + (1.0 - warmup_ratio) * alpha_w
        real = (step - warmup_iter) / jnp.maximum(max_iter - warmup_iter, 1)
        main = (1.0 - real) ** power
        ratio = jnp.where(step < warmup_iter, warm, main)
        return base_lr * jnp.maximum(ratio, 0.0)

    return schedule


def warmup_cosine_schedule(
    base_lr: float,
    max_iter: int,
    eta_ratio: float = 0.0,
    warmup_iter: int = 0,
    warmup_ratio: float = 0.1,
) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha_w = step / jnp.maximum(warmup_iter, 1)
        warm = warmup_ratio ** (1.0 - alpha_w)  # exp warmup (reference default)
        real_max = jnp.maximum(max_iter - warmup_iter, 1)
        main = eta_ratio + (1 - eta_ratio) * (1 + jnp.cos(jnp.pi * step / real_max)) / 2
        ratio = jnp.where(step < warmup_iter, warm, main)
        return base_lr * ratio

    return schedule


SCHEDULES = {
    "warmuppolylr": warmup_poly_schedule,
    "warmupcosinelr": warmup_cosine_schedule,
}


def get_schedule(name: str, **kw) -> optax.Schedule:
    if name not in SCHEDULES:
        raise ValueError(f"Unknown schedule {name!r}")
    return SCHEDULES[name](**kw)


def get_optimizer(
    name: str,
    schedule: optax.Schedule,
    weight_decay: float = 0.01,
    train_type: str = "all",
    params: Optional[Any] = None,
    grad_clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build AdamW/SGD, optionally masked to adapter-only parameters.

    In 'all' mode, 1-D params (norms, biases) get no weight decay, matching
    the reference's wd/nwd param groups (optimizers.py:33-45).
    """
    if name == "adamw":
        decay_mask = None
        if params is not None:
            decay_mask = jax.tree.map(lambda p: p.ndim > 1, params)
        tx = optax.adamw(
            schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
            mask=decay_mask,
        )
    elif name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(schedule, momentum=0.9),
        )
    else:
        raise ValueError(f"Unknown optimizer {name!r}")

    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)

    if "Adapter" in train_type:
        assert params is not None, "adapter masking needs the param tree"
        mask = adapter_mask(params)
        tx = optax.chain(
            optax.masked(tx, mask),
            # hard-zero updates for frozen params (masked already skips them,
            # but be explicit so a future transform can't leak updates)
            optax.masked(optax.set_to_zero(), jax.tree.map(lambda m: not m, mask)),
        )
    return tx
