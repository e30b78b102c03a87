"""Parity hardening (VERDICT r1 item 5) backing the ±0.1-mIoU claim:

1. Full-architecture forward parity: real Swin-B dims/depths/window-12 at a
   realistic aspect ratio, torch oracle vs JAX through the checkpoint
   importer.
2. Gradient parity: torch autograd vs jax.grad on the same loss — the torch
   GRAD state_dict is mapped through the SAME importer (gradients transform
   identically to parameters under the importer's linear reparametrizations),
   then compared leaf-by-leaf.
3. Metric parity: our streaming Metrics vs the reference semseg/metrics.py
   formulas (compute_iou / F1 / acc from one confusion matrix).

The reference's val_mm.py itself cannot run here (mmcv/mmengine are not
installed in this environment); the torch oracle (tests/utils/torch_swin_ref)
reproduces its model math and is the comparison target.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ir_ads_tpu.models.cmnext import CMNeXt
from ir_ads_tpu.training.metrics import Metrics
from ir_ads_tpu.utils.torch_import import import_cmnext_state_dict
from tests.utils.torch_swin_ref import CMNeXtRef

from tests.test_swin_parity import TINY, _rand_init_torch  # noqa: F401


@pytest.mark.slow
def test_full_architecture_forward_parity():
    """Real Swin-B architecture (embed 128, depths (2,2,18,2), heads
    (4,8,16,32), window 12) at the PRODUCTION resolution 480x640
    (configs/nyu_rgbd.yaml:18-51) — every production code path against the
    torch oracle, including the shapes the bench actually runs: the 15x20
    stage-3 token plane (whole-plane DSCF level 3, 24x24 window padding)
    and the non-divisible pad/crop at every stage.  VERDICT r2 item 3:
    forward parity previously ran only at 192x256, so the production
    shapes took code paths the parity test never saw.

    Also checks a committed golden fingerprint of the JAX output
    (tests/golden/full_arch_480x640.npz) so platform-independent
    regressions (model math edits) are caught without the torch oracle.
    """
    tref = CMNeXtRef(
        embed_dim=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32), ws=12,
        num_classes=40, head_dims=(512, 256),
    )
    _rand_init_torch(tref)
    tref.eval()
    rng = np.random.RandomState(0)
    rgb = rng.randn(1, 480, 640, 3).astype(np.float32)
    dte = rng.randn(1, 480, 640, 3).astype(np.float32)
    with torch.no_grad():
        ty = tref(
            torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(dte).permute(0, 3, 1, 2),
        )[0]

    model = CMNeXt(backbone="SwinTransformer-B", num_classes=40,
                   mmst_mask=False)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.asarray(rgb), jnp.asarray(dte),
        )
    )()
    sd = {k: v.detach().numpy() for k, v in tref.state_dict().items()}
    variables, warnings = import_cmnext_state_dict(sd, variables)
    real = [w for w in warnings if "relative_position_index" not in w]
    assert not real, real[:10]
    y = model.apply(
        variables, jnp.asarray(rgb), jnp.asarray(dte), train=False
    )[0]
    y = np.asarray(y)
    np.testing.assert_allclose(
        y, ty.permute(0, 2, 3, 1).numpy(), atol=5e-3, rtol=5e-3
    )

    # golden fingerprint (committed): moments + a strided sample of logits
    flat = y.reshape(-1).astype(np.float64)
    fp = np.concatenate(
        [[flat.mean(), flat.std(), np.abs(flat).mean()], flat[::100003][:64]]
    )
    import os

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "full_arch_480x640.npz"
    )
    if not os.path.exists(golden_path):
        # first run generates it FROM a state that already passed the
        # torch-oracle comparison above — commit the file it writes
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        np.savez(golden_path, fingerprint=fp)
        import warnings as _w

        _w.warn(f"golden fingerprint generated at {golden_path}; commit it")
    else:
        want = np.load(golden_path)["fingerprint"]
        np.testing.assert_allclose(fp, want, atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_train_step_parity_with_torch():
    """Train-MODE parity (VERDICT r2 item 3b): one train step on the tiny
    CMNeXt — batch-stats BN forward + running-stat updates + the
    masked-label (ignore 255) CE loss + parameter gradients, all against
    the torch oracle in .train() mode.  Eval-mode gradient parity
    (test_gradient_parity_with_torch_autograd) never exercised the BN
    batch-statistics branch or the update rule; this does.

    Reference semantics: train_mm.py:136-148 (CE ignore_index 255),
    BatchNorm2d momentum 0.1 torch-convention == flax momentum 0.9.
    """
    tref = CMNeXtRef(
        embed_dim=16, depths=(1, 2, 1, 1), heads=(1, 2, 4, 8), ws=4,
        num_classes=5, head_dims=(32, 16),
    )
    _rand_init_torch(tref)
    tref.train()  # batch-stat BN + running-stat updates (dropout rates are 0)

    rng = np.random.RandomState(7)
    rgb = rng.randn(2, 64, 64, 3).astype(np.float32)
    dte = rng.randn(2, 64, 64, 3).astype(np.float32)
    labels = rng.randint(0, 5, (2, 64, 64)).astype(np.int64)
    labels[:, :8] = 255  # masked region (ignore label)

    t_rgb = torch.from_numpy(rgb).permute(0, 3, 1, 2)
    t_dte = torch.from_numpy(dte).permute(0, 3, 1, 2)
    # snapshot the state BEFORE the train-mode forward: the forward updates
    # BN running stats in place, and the jax model must start from the SAME
    # pre-step state (capturing after puts the import one update ahead)
    sd = {k: v.detach().numpy().copy() for k, v in tref.state_dict().items()}
    ty = tref(t_rgb, t_dte)[0]
    t_loss = torch.nn.functional.cross_entropy(
        ty, torch.from_numpy(labels), ignore_index=255
    )
    t_loss.backward()

    # zero every stochastic rate (adapter/head dropout): the torch oracle
    # is deterministic, so train-mode parity isolates the BN batch-stats
    # branch + masked loss + gradients
    model = CMNeXt(
        backbone="SwinTransformer-B", num_classes=5,
        backbone_kwargs=dict(
            embed_dim=16, depths=(1, 2, 1, 1), num_heads=(1, 2, 4, 8),
            window_size=4, drop_path_rate=0.0, adapter_drop=0.0,
        ),
        head_dims=(32, 16), mmst_mask=False, head_drop=0.0,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(rgb), jnp.asarray(dte)
    )
    variables, _ = import_cmnext_state_dict(sd, variables)

    from ir_ads_tpu.training.losses import cross_entropy

    def loss_fn(params):
        y, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(rgb), jnp.asarray(dte), train=True,
            mutable=["batch_stats"],
            rngs={
                "dropout": jax.random.PRNGKey(1),
                "mmst": jax.random.PRNGKey(2),
            },
        )
        loss = cross_entropy(
            y[0].astype(jnp.float32), jnp.asarray(labels), ignore_label=255
        )
        return loss, updates["batch_stats"]

    (j_loss, new_stats), j_grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(variables["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-4)

    # BN running stats after ONE train-mode forward must match torch's
    # (torch updates running_var with the UNBIASED batch var, flax with the
    # biased one: at n = B*H*W samples the ratio is n/(n-1) — covered by
    # rtol at these sizes)
    flat_new = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(new_stats)[0]
    }
    stats_vars = {
        "params": jax.tree.map(np.zeros_like, variables["params"]),
        "batch_stats": jax.tree.map(
            np.zeros_like, variables["batch_stats"]
        ),
    }
    t_stats_sd = {
        k: v.detach().numpy() for k, v in tref.state_dict().items()
    }
    t_imported, _ = import_cmnext_state_dict(t_stats_sd, stats_vars)
    compared = 0
    for p, want in jax.tree_util.tree_flatten_with_path(
        t_imported["batch_stats"]
    )[0]:
        got = flat_new[jax.tree_util.keystr(p)]
        np.testing.assert_allclose(
            got, np.asarray(want), rtol=2e-3, atol=1e-4,
            err_msg=f"BN stat mismatch at {jax.tree_util.keystr(p)}",
        )
        compared += 1
    assert compared >= 8, f"only {compared} BN stat leaves compared"

    # gradients in train mode (batch-stat BN branch)
    grad_sd = {
        k: p.grad.detach().numpy()
        for k, p in tref.named_parameters()
        if p.grad is not None
    }
    for k, v in tref.state_dict().items():
        if k not in grad_sd:
            grad_sd[k] = np.zeros_like(v.detach().numpy())
    grad_vars = {
        "params": jax.tree.map(np.zeros_like, variables["params"]),
        "batch_stats": jax.tree.map(
            np.zeros_like, variables["batch_stats"]
        ),
    }
    grad_imported, _ = import_cmnext_state_dict(grad_sd, grad_vars)
    flat_got = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(j_grads)[0]
    }
    compared = 0
    for path, want in jax.tree_util.tree_flatten_with_path(
        grad_imported["params"]
    )[0]:
        want = np.asarray(want)
        if not np.any(want):
            continue
        got = np.asarray(flat_got[jax.tree_util.keystr(path)])
        np.testing.assert_allclose(
            got, want, atol=1e-4, rtol=1e-3,
            err_msg=f"train-grad mismatch at {jax.tree_util.keystr(path)}",
        )
        compared += 1
    assert compared > 30, f"only {compared} gradient leaves compared"


@pytest.mark.slow
def test_gradient_parity_with_torch_autograd():
    """Same CE loss, same parameters: every imported-parameter gradient must
    match torch autograd (train-step parity, not just forward parity)."""
    tref = CMNeXtRef(
        embed_dim=16, depths=(1, 2, 1, 1), heads=(1, 2, 4, 8), ws=4,
        num_classes=5, head_dims=(32, 16),
    )
    _rand_init_torch(tref)
    tref.eval()  # frozen BN stats; dropout off — matches jax train=False

    rng = np.random.RandomState(1)
    rgb = rng.randn(2, 64, 64, 3).astype(np.float32)
    dte = rng.randn(2, 64, 64, 3).astype(np.float32)
    labels = rng.randint(0, 5, (2, 64, 64)).astype(np.int64)

    t_rgb = torch.from_numpy(rgb).permute(0, 3, 1, 2)
    t_dte = torch.from_numpy(dte).permute(0, 3, 1, 2)
    ty = tref(t_rgb, t_dte)[0]
    t_loss = torch.nn.functional.cross_entropy(
        ty, torch.from_numpy(labels)
    )
    t_loss.backward()
    grad_sd = {
        k: p.grad.detach().numpy()
        for k, p in tref.named_parameters()
        if p.grad is not None
    }
    # named_parameters() has no buffers (BN running stats, rel-pos index),
    # but the importer requires those keys — backfill zeros so it runs;
    # zero leaves are skipped in the comparison loop below
    for k, v in tref.state_dict().items():
        if k not in grad_sd:
            grad_sd[k] = np.zeros_like(v.detach().numpy())

    model = CMNeXt(
        backbone="SwinTransformer-B", num_classes=5,
        backbone_kwargs=dict(
            embed_dim=16, depths=(1, 2, 1, 1), num_heads=(1, 2, 4, 8),
            window_size=4, drop_path_rate=0.0,
        ),
        head_dims=(32, 16), mmst_mask=False,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(rgb), jnp.asarray(dte)
    )
    sd = {k: v.detach().numpy() for k, v in tref.state_dict().items()}
    variables, _ = import_cmnext_state_dict(sd, variables)

    def loss_fn(params):
        y = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(rgb), jnp.asarray(dte), train=False,
        )[0]
        logp = jax.nn.log_softmax(y.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, jnp.asarray(labels)[..., None], -1)
        return ce.mean()

    j_loss, j_grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-4)

    # map torch grads through the SAME importer machinery: gradients
    # transform exactly like parameters under transpose/reshape imports
    zeros = jax.tree.map(np.zeros_like, variables["params"])
    grad_vars = {
        "params": zeros,
        "batch_stats": jax.tree.map(
            np.zeros_like, variables["batch_stats"]
        ),
    }
    grad_imported, _ = import_cmnext_state_dict(grad_sd, grad_vars)

    flat_want = jax.tree_util.tree_flatten_with_path(
        grad_imported["params"]
    )[0]
    flat_got = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(j_grads)[0]
    }
    compared = 0
    for path, want in flat_want:
        want = np.asarray(want)
        if not np.any(want):  # keys absent from the torch grad dict
            continue
        got = np.asarray(flat_got[jax.tree_util.keystr(path)])
        np.testing.assert_allclose(
            got, want, atol=1e-4, rtol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
        compared += 1
    assert compared > 30, f"only {compared} gradient leaves compared"


def test_metrics_match_reference_formulas():
    """Our Metrics vs the reference semseg/metrics.py math: confusion-matrix
    ious / per-class F1 / acc (reference metrics.py:45-106, with the real
    F1/acc formulas of tools/val_mm.py:81-82, not the acc=f1=iou quirk)."""
    rng = np.random.RandomState(0)
    n_cls = 7
    pred = rng.randint(0, n_cls, (3, 32, 32))
    label = rng.randint(0, n_cls, (3, 32, 32))
    label[0, :4] = 255  # ignore region

    m = Metrics(n_cls, 255)
    m.update(jnp.asarray(pred), jnp.asarray(label))
    ious, miou = m.compute_iou()
    f1, mf1 = m.compute_f1()
    acc, macc = m.compute_pixel_acc()

    # reference formulas from one confusion matrix
    keep = label != 255
    hist = np.bincount(
        n_cls * label[keep].astype(int) + pred[keep], minlength=n_cls**2
    ).reshape(n_cls, n_cls)
    tp = np.diag(hist).astype(np.float64)
    fp = hist.sum(0) - tp
    fn = hist.sum(1) - tp
    want_iou = tp / np.maximum(tp + fp + fn, 1e-12)
    want_f1 = 2 * tp / np.maximum(2 * tp + fp + fn, 1e-12)
    want_acc = tp / np.maximum(tp + fn, 1e-12)
    np.testing.assert_allclose(np.asarray(ious), want_iou, rtol=1e-5)
    # compute_f1/acc round to 2 decimals of percent -> atol 1e-4 fraction
    np.testing.assert_allclose(
        np.asarray(f1) / 100.0, want_f1, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(acc) / 100.0, want_acc, atol=1e-4
    )
    np.testing.assert_allclose(
        float(miou), want_iou.mean() * 100, atol=0.01
    )
