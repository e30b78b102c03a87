"""Train state + the jitted IR-ADS training step.

Replicates train_mm.py's semantics (reference train_mm.py:119-193) as a single
pure function:

  * three-head loss: CE(fused) + 0.01*CE(rgb, masked) + 0.01*CE(dte, masked),
    where "masked" labels set pixels the fused head already predicts
    correctly to ignore — MMST self-training on the fused model's errors
    (train_mm.py:136-148).
  * AMP → native bf16 compute (TPU has no GradScaler need: bf16 has fp32's
    exponent range, so loss scaling is unnecessary).
  * DDP → ``data``-axis sharding; XLA inserts the gradient all-reduce.
  * BatchNorm statistics (DSCF fuse layers + SegFormer heads) are carried in
    ``batch_stats`` and updated functionally.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


def make_train_step(
    loss_fn: Callable,
    ignore_label: int = 255,
    aux_weight: float = 0.01,
):
    """Build the jittable train step for CMNeXt.

    loss_fn(logits_nhwc, labels) -> scalar, e.g. losses.cross_entropy.
    """

    def train_step(
        state: TrainState,
        batch: Tuple[jax.Array, jax.Array, jax.Array],  # rgb, dte, label
        rng: jax.Array,
    ):
        rgb, dte, label = batch
        rng = jax.random.fold_in(rng, state.step)
        mmst_key, drop_key = jax.random.split(rng)

        def compute_loss(params):
            (y, y_rgb, y_dte), mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                rgb,
                dte,
                train=True,
                rngs={"mmst": mmst_key, "dropout": drop_key},
                mutable=["batch_stats"],
            )
            pred = jnp.argmax(y, axis=-1)
            # pixels the fused head got right are ignored in the aux losses
            mask_lbl = jnp.where(pred == label, ignore_label, label)
            loss_main = loss_fn(y, label, ignore_label)
            loss_rgb = loss_fn(y_rgb, mask_lbl, ignore_label)
            loss_dte = loss_fn(y_dte, mask_lbl, ignore_label)
            loss = loss_main + aux_weight * (loss_rgb + loss_dte)
            return loss, (mut["batch_stats"], loss_main)

        (loss, (new_stats, loss_main)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {"loss": loss, "loss_main": loss_main}
        return new_state, metrics

    return train_step
