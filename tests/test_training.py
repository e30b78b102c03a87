"""Training-stack tests: losses vs torch, metrics, schedules, and a real
train step on a tiny CMNeXt over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from ir_ads_tpu.training.losses import cross_entropy, dice_loss, ohem_cross_entropy
from ir_ads_tpu.training.metrics import Metrics
from ir_ads_tpu.training.optim import (
    adapter_mask,
    get_optimizer,
    warmup_poly_schedule,
)

TINY_BACKBONE = dict(
    embed_dim=16,
    depths=(1, 1, 1, 1),
    num_heads=(1, 2, 4, 8),
    window_size=4,
    drop_path_rate=0.0,
)


pytestmark = pytest.mark.slow  # model-level: compile-dominated

def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 9, 5).astype(np.float32)
    labels = rng.randint(0, 5, (2, 8, 9))
    labels[0, :3] = 255

    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 255)
    ref = TF.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        ignore_index=255,
    )
    np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)


def test_cross_entropy_with_weights_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, 4, 3).astype(np.float32)
    labels = rng.randint(0, 3, (2, 4, 4))
    w = np.asarray([0.2, 1.0, 2.0], np.float32)
    ours = cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), 255, jnp.asarray(w)
    )
    ref = TF.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        weight=torch.from_numpy(w),
        ignore_index=255,
    )
    np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)


def test_ohem_matches_torch_reference():
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 6, 6, 4).astype(np.float32)
    labels = rng.randint(0, 4, (2, 6, 6))
    labels[1, 0] = 255

    ours = ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 255, 0.7)

    # independent torch reference (reference losses.py:31-40)
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    lb = torch.from_numpy(labels).long()
    n_min = lb[lb != 255].numel() // 16
    loss = TF.cross_entropy(lt, lb, ignore_index=255, reduction="none").view(-1)
    thresh = -torch.log(torch.tensor(0.7))
    loss_hard = loss[loss > thresh]
    if loss_hard.numel() < n_min:
        loss_hard, _ = loss.topk(n_min)
    ref = loss_hard.mean()
    np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)


def test_metrics_confusion():
    m = Metrics(num_classes=3, ignore_label=255)
    pred = jnp.asarray([[0, 1, 2, 2]])
    gt = jnp.asarray([[0, 1, 1, 255]])
    m.update(pred, gt)
    ious, miou = m.compute_iou()
    # class0: tp1 fp0 fn0 -> 1.0 ; class1: tp1 fp0 fn1 -> 0.5 ; class2: tp0 fp1 fn0 -> 0
    np.testing.assert_allclose(ious, [1.0, 0.5, 0.0], atol=1e-6)
    assert miou == 50.0
    acc, macc = m.compute_pixel_acc()
    np.testing.assert_allclose(acc, [100.0, 50.0, 0.0], atol=1e-6)


def test_warmup_poly_schedule_matches_reference_formula():
    sched = warmup_poly_schedule(
        base_lr=0.1, max_iter=1000, power=0.9, warmup_iter=100, warmup_ratio=0.1
    )
    # reference WarmupLR linear warmup at step 50: ratio = 0.1 + 0.9*0.5
    # (rtol 1e-5: TPU pow differs from CPU libm by ~2e-6 relative)
    np.testing.assert_allclose(float(sched(50)), 0.1 * (0.1 + 0.9 * 0.5), rtol=1e-5)
    # main phase at step 550: (1 - 450/900) ** 0.9
    np.testing.assert_allclose(
        float(sched(550)), 0.1 * (1 - 450 / 900) ** 0.9, rtol=1e-5
    )


def _tiny_model_and_state(num_classes=5, lr=1e-3, train_type="all"):
    from ir_ads_tpu.models.cmnext import CMNeXt
    from ir_ads_tpu.training.train_state import TrainState

    model = CMNeXt(
        backbone="SwinTransformer-B",
        num_classes=num_classes,
        backbone_kwargs=TINY_BACKBONE,
        head_dims=(32, 16),
    )
    rgb = jnp.zeros((4, 32, 32, 3))
    dte = jnp.zeros((4, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    sched = warmup_poly_schedule(lr, 100, 0.9, 10, 0.1)
    tx = get_optimizer(
        "adamw", sched, 0.01, train_type, params=variables["params"]
    )
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    return model, state


def test_train_step_runs_and_updates():
    from ir_ads_tpu.training.losses import cross_entropy
    from ir_ads_tpu.training.train_state import make_train_step

    model, state = _tiny_model_and_state()
    step = jax.jit(make_train_step(cross_entropy))
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    dte = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    lbl = jax.random.randint(jax.random.PRNGKey(3), (4, 32, 32), 0, 5)

    new_state, metrics = step(state, (rgb, dte, lbl), rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params changed
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_adapter_freeze_only_updates_adapter_params():
    from ir_ads_tpu.training.losses import cross_entropy
    from ir_ads_tpu.training.train_state import make_train_step

    model, state = _tiny_model_and_state(train_type="Adapter")
    mask = adapter_mask(state.params)
    step = jax.jit(make_train_step(cross_entropy))
    rgb = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    dte = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    lbl = jax.random.randint(jax.random.PRNGKey(3), (4, 32, 32), 0, 5)
    new_state, _ = step(state, (rgb, dte, lbl), jax.random.PRNGKey(0))

    flat_old = jax.tree_util.tree_leaves_with_path(state.params)
    flat_new = jax.tree.leaves(new_state.params)
    flat_mask = jax.tree.leaves(mask)
    changed_frozen = []
    changed_trainable = 0
    for (path, old), new, m in zip(flat_old, flat_new, flat_mask):
        delta = float(jnp.abs(old - new).max())
        if m:
            changed_trainable += delta > 0
        elif delta > 0:
            changed_frozen.append(jax.tree_util.keystr(path))
    assert not changed_frozen, f"frozen params changed: {changed_frozen[:5]}"
    assert changed_trainable > 0

    # sanity on the mask itself: patch_embed frozen, adapters/heads trainable
    names = [jax.tree_util.keystr(p) for p, _ in flat_old]
    by_name = dict(zip(names, flat_mask))
    assert any("adapter" in n and by_name[n] for n in names)
    assert any("patch_embed" in n and "extra" not in n and not by_name[n] for n in names)


def test_train_step_sharded_over_mesh():
    import pytest
    if jax.device_count() < 8:
        pytest.skip('needs 8 devices')
    """The same train step under data-axis sharding on the 8-CPU mesh."""
    from ir_ads_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from ir_ads_tpu.training.losses import cross_entropy
    from ir_ads_tpu.training.train_state import make_train_step

    model, state = _tiny_model_and_state()
    mesh = make_mesh()
    assert mesh.devices.size == 8
    state = replicate(state, mesh)
    rgb = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    dte = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3))
    lbl = jax.random.randint(jax.random.PRNGKey(3), (8, 32, 32), 0, 5)
    batch = shard_batch((rgb, dte, lbl), mesh)

    step = jax.jit(make_train_step(cross_entropy))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_sliding_window_matches_direct_on_tile_sized_image():
    from ir_ads_tpu.evaluation.semseg_eval import make_sliding_window_fn

    def forward(rgb, dte):
        # deterministic fake model: logits depend on inputs
        base = rgb[..., :1] * 2.0 + dte[..., :1]
        return jnp.concatenate([base, -base, base * 0.5], axis=-1)

    rgb = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    dte = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    fn = make_sliding_window_fn(
        forward, (16, 16), (16, 16), num_classes=3, flip=False
    )
    out = fn(rgb, dte)
    direct = forward(rgb, dte)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct), atol=1e-5)


def test_sliding_window_tiles_cover_and_average():
    from ir_ads_tpu.evaluation.semseg_eval import make_sliding_window_fn

    def forward(rgb, dte):
        return jnp.ones(rgb.shape[:3] + (2,)) * 7.0

    rgb = jnp.zeros((1, 20, 28, 3))
    dte = jnp.zeros((1, 20, 28, 3))
    fn = make_sliding_window_fn(forward, (20, 28), (12, 12), 2, flip=True)
    out = fn(rgb, dte)
    # every pixel must be the average of identical tile outputs (7*2 for flip)
    np.testing.assert_allclose(np.asarray(out), 14.0, atol=1e-5)


def test_msf_shapes():
    from ir_ads_tpu.evaluation.semseg_eval import msf_logits

    def forward(rgb, dte):
        return jnp.zeros(rgb.shape[:3] + (4,))

    rgb = jnp.zeros((2, 30, 40, 3))
    dte = jnp.zeros((2, 30, 40, 3))
    probs = msf_logits(forward, rgb, dte, scales=(0.5, 1.0), flip=True)
    assert probs.shape == (2, 30, 40, 4)
    # 2 scales x 2 (flip) softmax of zeros = uniform 0.25 each, summed -> 1.0
    np.testing.assert_allclose(np.asarray(probs), 1.0, atol=1e-5)


def test_scanned_stage_bf16_train_carry_dtype():
    """Regression: traced f32 drop-path rates must not promote a bf16
    activation — the deep-stage nn.scan carry then fails dtype checking
    ("carry input bfloat16 but output float32"), which broke training
    on the real Swin-B config (depths>=4 stage + drop_path>0 + AMP).
    Tiny 4-block stage triggers the scan path."""
    from ir_ads_tpu.models.backbones.swin import SwinStage

    stage = SwinStage(
        dim=16,
        depth=4,  # >= 4 and even -> nn.scan over block pairs
        num_heads=2,
        ffn_dim=32,
        window_size=4,
        drop_rate=0.0,
        drop_path_rates=(0.1, 0.1, 0.1, 0.1),
        downsample=False,
        dtype=jnp.bfloat16,
    )
    x = jnp.zeros((2, 8, 8, 16), jnp.bfloat16)
    variables = stage.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, "rgb", False,
    )
    out, _ = stage.apply(
        variables, x, "rgb", False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out.dtype == jnp.bfloat16
