"""Detection training: loss assembly + jitted teacher-student train step.

Replicates the vCLR training semantics (projects/.../train_net.py:50-137 +
dino.py forward):
  * student on the strong view with CDN denoising; Hungarian losses on every
    decoder layer + the encoder stage (TwoStageCriterion), CDN losses
    (DINOCriterion), point-sampled mask losses;
  * EMA teacher inference on the weak view; consistency loss between
    Hungarian-matched student queries and confident teacher detections
    (ConsisCriterion);
  * AdamW with backbone lr multiplier and grad clipping
    (train_net.py:174-203: backbone 2e-5, sampling offsets 2e-5, rest 2e-4,
    clip 0.1), EMA decay 0.999.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ir_ads_tpu.detection.criterion import (
    consistency_loss,
    dn_criterion,
    set_criterion,
)
from ir_ads_tpu.detection.dino import split_dn
from ir_ads_tpu.detection.ema import ema_init, ema_update

DEFAULT_WEIGHTS = {
    "loss_class": 1.0,
    "loss_bbox": 5.0,
    "loss_giou": 2.0,
    "loss_mask": 1.0,
    "loss_dice": 1.0,
}


def detection_losses(
    outputs: Dict[str, jax.Array],
    gt_labels: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    gt_masks: Optional[jax.Array],
    key: jax.Array,
    mask_loss_points: int = 12544,
) -> Dict[str, jax.Array]:
    """Aggregate per-layer + enc + dn losses from DINODetector outputs."""
    n_dn = outputs["n_dn"]
    n_layers = outputs["pred_logits"].shape[0]
    losses: Dict[str, jax.Array] = {}

    import os

    # round-5: the model emits mask EMBEDDINGS + seg features in train
    # mode; the criterion computes matched masks itself (criterion.py
    # set_criterion mask_embeds path).  pred_masks is the legacy/test
    # input form.
    embeds_mode = "pred_mask_embeds" in outputs
    mask_stack = (
        outputs["pred_mask_embeds"] if embeds_mode
        else outputs["pred_masks"]
    )
    seg_feat = outputs.get("seg_feat")
    seg_hw = outputs.get("seg_hw")

    def _layer_losses(logits, boxes, masks, sub):
        """One decoder level's dn + Hungarian losses (pure in its args,
        so it can run unrolled OR under vmap)."""
        lvl = {}
        if n_dn > 0:
            dn_logits, logits = split_dn(logits, n_dn)
            dn_boxes, boxes = split_dn(boxes, n_dn)
            masks = masks[:, n_dn:]
            lvl.update(
                dn_criterion(
                    dn_logits, dn_boxes, gt_labels, gt_boxes, gt_valid,
                    outputs["n_groups"],
                )
            )
        use_masks = gt_masks is not None
        lvl.update(
            set_criterion(
                logits, boxes, gt_labels, gt_boxes, gt_valid,
                pred_masks=(
                    masks if use_masks and not embeds_mode else None
                ),
                gt_masks=gt_masks,
                mask_key=sub,
                num_points=mask_loss_points,
                mask_embeds=(
                    masks if use_masks and embeds_mode else None
                ),
                seg_feat=seg_feat,
                seg_hw=seg_hw,
            )
        )
        return lvl

    if os.environ.get("IR_ADS_DET_CRIT", "loop") == "vmap":
        # round-4: ONE criterion instance batched over decoder levels
        # instead of n_layers unrolled copies — the unrolled train-step
        # HLO exceeds the relay's remote compile helper
        # (dev/probe_dino_train_ladder.py).  The matcher's while_loop
        # vmaps to a batched while; same math, levels-many subkeys drawn
        # in one split (point-sampling streams differ from the loop path
        # but are identically distributed).
        key, sub = jax.random.split(key)
        subs = jax.random.split(sub, n_layers)
        stacked = jax.vmap(_layer_losses)(
            outputs["pred_logits"], outputs["pred_boxes"],
            mask_stack, subs,
        )
        for k, v in stacked.items():
            for lvl in range(n_layers):
                losses[f"{k}_{lvl}"] = v[lvl]
    else:
        for lvl in range(n_layers):
            key, sub = jax.random.split(key)
            lvl_losses = _layer_losses(
                outputs["pred_logits"][lvl],
                outputs["pred_boxes"][lvl],
                mask_stack[lvl],
                sub,
            )
            for k, v in lvl_losses.items():
                losses[f"{k}_{lvl}"] = v

    # encoder stage (enc_outputs in the reference)
    key, sub = jax.random.split(key)
    use_masks = gt_masks is not None
    enc_losses = set_criterion(
        outputs["enc_logits"], outputs["enc_boxes"],
        gt_labels, gt_boxes, gt_valid,
        pred_masks=(
            outputs["enc_masks"] if use_masks and not embeds_mode else None
        ),
        gt_masks=gt_masks,
        mask_key=sub,
        num_points=mask_loss_points,
        mask_embeds=(
            outputs["enc_mask_embed"] if use_masks and embeds_mode else None
        ),
        seg_feat=seg_feat,
        seg_hw=seg_hw,
    )
    for k, v in enc_losses.items():
        losses[f"{k}_enc"] = v
    return losses


class DetTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    ema_params: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            ema_params=ema_init(params),
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


def detection_optimizer(
    params: Any,
    base_lr: float = 2e-4,
    backbone_mult: float = 0.1,
    offsets_mult: float = 0.1,
    weight_decay: float = 1e-4,
    clip_norm: float = 0.1,
    total_steps: int = 60000,
) -> optax.GradientTransformation:
    """Param groups per reference train_net.py:174-203."""

    def label_fn(params):
        def label(path, _):
            joined = "/".join(
                str(getattr(p, "key", p)) for p in path
            ).lower()
            if "backbone" in joined:
                return "backbone"
            if "sampling_offsets" in joined:
                return "offsets"
            return "rest"

        return jax.tree_util.tree_map_with_path(label, params)

    def make(mult):
        return optax.adamw(base_lr * mult, weight_decay=weight_decay)

    tx = optax.multi_transform(
        {"backbone": make(backbone_mult), "offsets": make(offsets_mult),
         "rest": make(1.0)},
        label_fn(params),
    )
    return optax.chain(optax.clip_by_global_norm(clip_norm), tx)


def make_detection_train_step(
    ema_decay: float = 0.999,
    consistency_weight: float = 1.0,
    teacher_score_thresh: float = 0.5,
    use_teacher: bool = True,
):
    """Returns the jittable step:
    (state, (strong_imgs, weak_imgs, labels, boxes, valid, masks), rng)."""

    def step(state: DetTrainState, batch, rng: jax.Array):
        strong, weak, labels, boxes, valid, masks = batch
        rng = jax.random.fold_in(rng, state.step)
        cdn_key, loss_key = jax.random.split(rng)

        teacher_out = None
        if use_teacher:
            teacher_out = state.apply_fn(
                {"params": state.ema_params, "batch_stats": state.batch_stats},
                weak,
                train=False,
                # consistency only reads queries/boxes/logits — skip the
                # ~0.8 GB eval-mode full mask stack (round-5 memory fix)
                want_masks=False,
            )
            teacher_out = jax.lax.stop_gradient(teacher_out)

        def loss_fn(params):
            out, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                strong, labels, boxes, valid,
                train=True,
                rngs={"cdn": cdn_key},
                mutable=["batch_stats"],
            )
            losses = detection_losses(
                out, labels, boxes, valid, masks, loss_key
            )
            if teacher_out is not None:
                t_logits = teacher_out["pred_logits"][-1]
                t_scores = jax.nn.sigmoid(
                    t_logits.astype(jnp.float32)
                ).max(-1)
                t_valid = t_scores > teacher_score_thresh
                n_dn = out["n_dn"]
                s_queries = out["pred_queries"][-1][:, n_dn:]
                s_boxes = out["pred_boxes"][-1][:, n_dn:]
                losses["loss_consistency"] = (
                    consistency_weight
                    * consistency_loss(
                        s_queries,
                        teacher_out["pred_queries"][-1],
                        teacher_out["pred_boxes"][-1],
                        s_boxes,
                        t_valid,
                    )
                )
            total = sum(losses.values())
            return total, (mut["batch_stats"], losses)

        (total, (new_stats, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            ema_params=ema_update(state.ema_params, new_params, ema_decay),
            opt_state=new_opt,
        )
        metrics = {"loss": total, **losses}
        return new_state, metrics

    return step
