#!/usr/bin/env python
"""Multimodal segmentation training driver (reference train_mm.py).

Usage: python train_mm.py --cfg configs/nyu_rgbd.yaml

TPU-native semantics vs the reference:
  * DDP/NCCL/GradScaler -> one jax.sharding.Mesh with a `data` axis; the
    train step is jit-compiled with batch inputs sharded on it.  AMP=true
    means bf16 compute (no loss scaling needed on TPU).
  * The 3-head MMST loss, adapter-only finetuning, warmup-poly schedule,
    eval-gated best checkpointing all match train_mm.py:119-193.
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.data.augmentations import get_train_augmentation, get_val_augmentation
from ir_ads_tpu.data.datasets import get_dataset
from ir_ads_tpu.data.loader import DataLoader, prefetch_to_mesh
from ir_ads_tpu.evaluation.semseg_eval import evaluate, make_forward_fn
from ir_ads_tpu.models import build_model
from ir_ads_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ir_ads_tpu.training.losses import get_loss
from ir_ads_tpu.training.metrics import Metrics
from ir_ads_tpu.training.optim import get_optimizer, get_schedule
from ir_ads_tpu.training.train_state import TrainState, make_train_step
from ir_ads_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from ir_ads_tpu.utils.config import load_config
from ir_ads_tpu.utils.logging import ScalarWriter, get_logger
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()


def build_model_and_state(cfg, num_classes, rng_seed=3407, sample_hw=(64, 64)):
    model_cfg, train_cfg = cfg["MODEL"], cfg["TRAIN"]
    optim_cfg, sched_cfg = cfg["OPTIMIZER"], cfg["SCHEDULER"]
    dtype = jnp.bfloat16 if train_cfg.get("AMP", True) else None
    model = build_model(
        model_cfg.get("NAME", "CMNeXt"),
        model_cfg["BACKBONE"],
        num_classes=num_classes,
        dtype=dtype,
        backbone_kwargs=model_cfg.get("BACKBONE_KWARGS"),
    )
    h, w = sample_hw
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    # jit the init: eager init dispatches thousands of tiny ops, which is
    # pathological through remote-execution relays (minutes instead of ~30 s)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(rng_seed)}, dummy, dummy
        )
    )()

    iters_per_epoch = cfg["_iters_per_epoch"]
    epochs = train_cfg["EPOCHS"]
    schedule = get_schedule(
        sched_cfg["NAME"],
        base_lr=optim_cfg["LR"],
        max_iter=int((epochs + 1) * iters_per_epoch),
        power=sched_cfg.get("POWER", 0.9),
        warmup_iter=iters_per_epoch * sched_cfg.get("WARMUP", 10),
        warmup_ratio=sched_cfg.get("WARMUP_RATIO", 0.1),
    )
    train_type = optim_cfg.get("TRAIN_TYPE", "all")
    if "Adapter" in train_type:
        # adapter-only freeze (reference optimizers.py:7-31): the attention
        # parameter grads are discarded by optax.masked, so the Pallas
        # backward may skip computing them (ops/pallas_swin.py
        # _attn_bwd_trainables)
        os.environ.setdefault("IR_ADS_ATTN_BWD_TRAINABLES", "adapter")
    tx = get_optimizer(
        optim_cfg["NAME"],
        schedule,
        optim_cfg.get("WEIGHT_DECAY", 0.01),
        train_type,
        params=variables["params"],
    )
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    return model, state


def _usable_devices(batch_size: int):
    """Largest device count that divides the batch (data-axis sharding)."""
    devs = jax.devices()
    n = len(devs)
    while batch_size % n:
        n -= 1
    return devs[:n]


def main(cfg, save_dir: Path):
    logger = get_logger(save_dir / "train.log")
    writer = ScalarWriter(str(save_dir))
    train_cfg, eval_cfg = cfg["TRAIN"], cfg["EVAL"]
    dataset_cfg, model_cfg = cfg["DATASET"], cfg["MODEL"]

    mesh = make_mesh(devices=_usable_devices(train_cfg["BATCH_SIZE"]))
    logger.info(f"mesh: {mesh.devices.shape} over {jax.devices()[0].platform}")

    ds_cls = get_dataset(dataset_cfg["NAME"])
    traintf = get_train_augmentation(
        train_cfg["IMAGE_SIZE"], seg_fill=dataset_cfg["IGNORE_LABEL"]
    )
    valtf = get_val_augmentation(eval_cfg["IMAGE_SIZE"])
    trainset = ds_cls(dataset_cfg["ROOT"], "train", traintf, dataset_cfg["MODALS"])
    valset = ds_cls(dataset_cfg["ROOT"], "val", valtf, dataset_cfg["MODALS"])
    logger.info(f"train {len(trainset)} / val {len(valset)} images")

    batch_size = train_cfg["BATCH_SIZE"]
    cfg["_iters_per_epoch"] = max(len(trainset) // batch_size, 1)
    model, state = build_model_and_state(
        cfg, trainset.n_classes, sample_hw=train_cfg["IMAGE_SIZE"]
    )
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info(f"model {model_cfg['BACKBONE']}: {n_params/1e6:.1f}M params")

    best_miou, best_epoch, start_epoch = 0.0, 0, 0
    # IR_ADS_RESUME: set by tools/launch.py on auto-requeue
    resume = os.environ.get("IR_ADS_RESUME", "") or model_cfg.get("RESUME", "")
    if resume and os.path.isdir(resume):
        state, manifest = load_checkpoint(resume, state)
        best_miou = manifest.get("best_miou", 0.0)
        start_epoch = best_epoch = manifest.get("epoch", 0)
        logger.info(f"resumed from {resume} @ epoch {start_epoch}, best {best_miou}")

    state = replicate(state, mesh)
    loss_fn = get_loss(cfg["LOSS"]["NAME"])
    train_step = jax.jit(
        make_train_step(loss_fn, dataset_cfg["IGNORE_LABEL"]), donate_argnums=0
    )
    rng = jax.random.PRNGKey(3407)

    loader = DataLoader(trainset, batch_size, shuffle=True, drop_last=True)
    valloader = DataLoader(
        valset, eval_cfg["BATCH_SIZE"], shuffle=False, drop_last=False
    )

    epochs = train_cfg["EPOCHS"]
    for epoch in range(start_epoch, epochs):
        loader.set_epoch(epoch)
        t0, train_loss, n_iter = time.time(), 0.0, 0
        for batch in prefetch_to_mesh(iter(loader), mesh):
            rgb, dte, label = batch[0], batch[1 % (len(batch) - 1)], batch[-1]
            state, metrics = train_step(state, (rgb, dte, label), rng)
            train_loss += float(metrics["loss"])
            n_iter += 1
        train_loss /= max(n_iter, 1)
        ips = n_iter * batch_size / (time.time() - t0)
        writer.add_scalar("train/loss", train_loss, epoch)
        writer.add_scalar("train/img_per_sec", ips, epoch)
        logger.info(
            f"epoch {epoch + 1}/{epochs} loss {train_loss:.4f} ({ips:.1f} img/s)"
        )

        do_eval = (
            (epoch + 1) % train_cfg["EVAL_INTERVAL"] == 0
            and (epoch + 1) > train_cfg["EVAL_START"]
        ) or (epoch + 1) == epochs
        if do_eval:
            fwd = make_forward_fn(
                model, {"params": state.params, "batch_stats": state.batch_stats}
            )
            m = Metrics(trainset.n_classes, dataset_cfg["IGNORE_LABEL"])

            def batches():
                for b in valloader:
                    yield (
                        jnp.asarray(b[0]),
                        jnp.asarray(b[1 % (len(b) - 1)]),
                        jnp.asarray(b[-1]),
                    )

            evaluate(fwd, batches(), m, msf=False)
            _, miou = m.compute_iou()
            writer.add_scalar("val/mIoU", miou, epoch)
            logger.info(f"epoch {epoch + 1} mIoU {miou} (best {best_miou})")
            if miou > best_miou:
                best_miou, best_epoch = miou, epoch + 1
                ckpt_dir = save_dir / "best"
                save_checkpoint(
                    str(ckpt_dir), state, best_miou, best_epoch,
                    extra={"config": {k: v for k, v in cfg.items() if not k.startswith("_")}},
                )
                logger.info(f"saved best checkpoint to {ckpt_dir}")
        # always keep a rolling full checkpoint for requeue/resume
        # (reference train_mm.py:183-191 dual-save; tools/launch.py picks
        # the newest manifest on restart)
        save_checkpoint(
            str(save_dir / "latest"), state, best_miou, epoch + 1,
            extra={"config": {k: v for k, v in cfg.items() if not k.startswith("_")}},
        )

    writer.close()
    logger.info(f"done. best mIoU {best_miou} @ epoch {best_epoch}")
    return best_miou


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, default="configs/nyu_rgbd.yaml")
    args = parser.parse_args()
    cfg = load_config(args.cfg)
    modals = "".join(m[0] for m in cfg["DATASET"]["MODALS"])
    exp_name = "_".join([cfg["DATASET"]["NAME"], cfg["MODEL"]["BACKBONE"], modals])
    save_dir = Path(cfg["SAVE_DIR"]) / exp_name
    save_dir.mkdir(parents=True, exist_ok=True)
    main(cfg, save_dir)
