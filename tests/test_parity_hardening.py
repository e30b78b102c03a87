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
    (4,8,16,32), window 12) at 192x256 — every production code path
    (bias-table 12, 18-block scan pair, 4-level DSCF) against the torch
    oracle.  Recipe ref: configs/nyu_rgbd.yaml:18-51."""
    tref = CMNeXtRef(
        embed_dim=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32), ws=12,
        num_classes=40, head_dims=(512, 256),
    )
    _rand_init_torch(tref)
    tref.eval()
    rng = np.random.RandomState(0)
    rgb = rng.randn(1, 192, 256, 3).astype(np.float32)
    dte = rng.randn(1, 192, 256, 3).astype(np.float32)
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
    np.testing.assert_allclose(
        np.asarray(y), ty.permute(0, 2, 3, 1).numpy(), atol=5e-3, rtol=5e-3
    )


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
