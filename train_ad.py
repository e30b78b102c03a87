#!/usr/bin/env python
"""Anomaly-separation training/eval driver.

The reference ships the anomaly stack's pieces (LightSB, DeviationLoss,
feature extractors, MVTecAD dataset, balanced sampler) but NO driver — its
imports (`modeling.sb_modules`, geotorch) are missing and nothing calls them
(SURVEY.md §0).  This driver completes the graft:

  1. Train the deviation network (ResNet trunk + score head) on balanced
     2:1 normal:outlier batches with CutMix pseudo-anomalies, deviation loss
     (labels {0,1,2}: 1/2 treated as outlier, matching the DRA protocol).
  2. Evaluate AUROC on the unseen-defect test split.
  3. Optionally fit a Light Schrödinger Bridge between the normal and
     anomalous feature measures and score test samples by bridge potential /
     Euler–Maruyama separation.

Usage:
  python train_ad.py --dataset_root data/mvtec --classname carpet \\
      --nAnomaly 10 --epochs 10 [--lightsb]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ir_ads_tpu.anomaly import (
    AnomalyScoreNet,
    deviation_loss,
    get_log_C,
    get_log_potential,
    init_lightsb,
    init_r_by_samples,
)
from ir_ads_tpu.anomaly.data import ADConfig, MVTecAD, balanced_batches, test_batches
from ir_ads_tpu.utils.checkpoint import save_weights
from ir_ads_tpu.utils.logging import get_logger
from ir_ads_tpu.utils.compile_cache import setup_compilation_cache

setup_compilation_cache()


def auroc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based AUROC (Mann-Whitney U), no sklearn dependency."""
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks for ties
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j + 1 < len(s_sorted) and s_sorted[j + 1] == s_sorted[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = ranks[order[i : j + 1]].mean()
        i = j + 1
    pos = labels > 0
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def fit_lightsb(feats0, feats1, key, n_potentials=10, epsilon=1.0, steps=500, lr=1e-2):
    """Fit the bridge between feature measures p0 (normal) -> p1 (anomalous)
    by the LightSB objective: E_{x~p0}[log C(x)] - E_{y~p1}[log v(y)]."""
    dim = feats0.shape[-1]
    params, eps = init_lightsb(
        key, dim=dim, n_potentials=n_potentials, epsilon=epsilon
    )
    idx = np.random.RandomState(0).choice(len(feats1), n_potentials)
    params = init_r_by_samples(params, feats1[idx])
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x0, x1):
        def loss_fn(p):
            return jnp.mean(get_log_C(p, eps, x0)) - jnp.mean(
                get_log_potential(p, eps, x1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(1)
    for i in range(steps):
        b0 = feats0[rng.choice(len(feats0), min(128, len(feats0)), replace=False)]
        b1 = feats1[rng.choice(len(feats1), min(128, len(feats1)), replace=True)]
        params, opt_state, loss = step(params, opt_state, b0, b1)
    return params, eps, float(loss)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--classname", required=True)
    p.add_argument("--know_class", default=None)
    p.add_argument("--nAnomaly", type=int, default=10)
    p.add_argument("--cont_rate", type=float, default=0.0)
    p.add_argument("--outlier_root", default=None)
    p.add_argument("--img_size", type=int, default=448)
    p.add_argument("--backbone", default="resnet18", choices=["resnet18", "resnet50"])
    p.add_argument("--batch_size", type=int, default=48)
    p.add_argument("--steps_per_epoch", type=int, default=20)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lightsb", action="store_true", help="fit the bridge")
    p.add_argument("--sb_potentials", type=int, default=10)
    p.add_argument("--output", default="output/anomaly")
    args = p.parse_args()
    logger = get_logger()

    cfg = ADConfig(
        dataset_root=args.dataset_root,
        classname=args.classname,
        know_class=args.know_class,
        n_anomaly=args.nAnomaly,
        cont_rate=args.cont_rate,
        img_size=args.img_size,
        outlier_root=args.outlier_root,
    )
    trainset = MVTecAD(cfg, train=True)
    testset = MVTecAD(cfg, train=False)
    logger.info(
        f"{args.classname}: train {len(trainset)} "
        f"({len(trainset.outlier_idx)} outliers), test {len(testset)}"
    )

    model = AnomalyScoreNet(backbone=args.backbone)
    dummy = jnp.zeros((1, args.img_size, args.img_size, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy)
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])
    batch_stats = variables["batch_stats"]
    params = variables["params"]

    @jax.jit
    def train_step(params, batch_stats, opt_state, imgs, labels):
        def loss_fn(p):
            (score, _), mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs,
                train=True,
                mutable=["batch_stats"],
            )
            y = (labels > 0).astype(jnp.float32)
            return deviation_loss(score, y), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    @jax.jit
    def infer(params, batch_stats, imgs):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, train=False
        )

    for epoch in range(args.epochs):
        t0, losses = time.time(), []
        for imgs, labels in balanced_batches(
            trainset, args.batch_size, args.steps_per_epoch, seed=10 + epoch
        ):
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, jnp.asarray(imgs), jnp.asarray(labels)
            )
            losses.append(float(loss))
        logger.info(
            f"epoch {epoch + 1}/{args.epochs} loss {np.mean(losses):.4f} "
            f"({time.time() - t0:.1f}s)"
        )

    # evaluate
    scores, labels, feats = [], [], []
    for imgs, lbl in test_batches(testset, args.batch_size):
        s, f = infer(params, batch_stats, jnp.asarray(imgs))
        scores.append(np.asarray(s))
        feats.append(np.asarray(f))
        labels.append(lbl)
    scores = np.concatenate(scores)
    labels = np.concatenate(labels)
    feats = np.concatenate(feats)
    roc = auroc(scores, labels)
    logger.info(f"deviation-score AUROC: {roc:.4f}")

    if args.lightsb:
        # bridge between train normal features and known-anomaly features
        tr_feats, tr_labels = [], []
        for imgs, lbl in test_batches(trainset, args.batch_size):
            _, f = infer(params, batch_stats, jnp.asarray(imgs))
            tr_feats.append(np.asarray(f))
            tr_labels.append(lbl)
        tr_feats = np.concatenate(tr_feats)
        tr_labels = np.concatenate(tr_labels)
        f0 = tr_feats[tr_labels == 0]
        f1 = tr_feats[tr_labels > 0]
        if len(f1) >= 2:
            sb_params, eps, sb_loss = fit_lightsb(
                jnp.asarray(f0), jnp.asarray(f1), jax.random.PRNGKey(2),
                n_potentials=min(args.sb_potentials, len(f1)),
            )
            logger.info(f"LightSB fitted (final objective {sb_loss:.4f})")
            # bridge potential as an auxiliary anomaly score
            sb_score = np.asarray(get_log_potential(sb_params, eps, jnp.asarray(feats)))
            roc_sb = auroc(sb_score, labels)
            roc_comb = auroc(
                (scores - scores.mean()) / (scores.std() + 1e-8)
                + (sb_score - sb_score.mean()) / (sb_score.std() + 1e-8),
                labels,
            )
            logger.info(f"LightSB-potential AUROC: {roc_sb:.4f}  combined: {roc_comb:.4f}")

    import os

    os.makedirs(args.output, exist_ok=True)
    save_weights(
        f"{args.output}/{args.classname}_weights.msgpack", params, batch_stats
    )
    logger.info(f"saved weights to {args.output}/{args.classname}_weights.msgpack")
    return roc


if __name__ == "__main__":
    main()
