"""Anomaly stack tests: LightSB math vs an independent torch implementation
of the reference formulas (modules/sb.py), deviation loss, dataset assembly,
and an end-to-end mini training run."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ir_ads_tpu.anomaly import (
    deviation_loss,
    get_drift,
    get_log_C,
    get_log_potential,
    init_lightsb,
    sample_euler_maruyama,
    sample_posterior,
)
from ir_ads_tpu.anomaly.sb import LightSBParams, _exp_argument

pytestmark = pytest.mark.slow  # model-level: compile-dominated


def _params(dim=6, n=4, seed=0):
    rng = np.random.RandomState(seed)
    return LightSBParams(
        log_alpha_raw=jnp.asarray(rng.randn(n).astype(np.float32) * 0.1),
        r=jnp.asarray(rng.randn(n, dim).astype(np.float32)),
        S_log_diag=jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.3 - 1.0),
        S_rot_raw=None,
    )


def test_log_C_matches_torch_reference():
    eps = 0.17
    p = _params()
    x = np.random.RandomState(1).randn(5, 6).astype(np.float32)

    # torch reference (sb.py:212-227, diagonal)
    S = torch.exp(torch.from_numpy(np.asarray(p.S_log_diag)))
    r = torch.from_numpy(np.asarray(p.r))
    log_alpha = torch.from_numpy(np.asarray(p.log_alpha_raw)) / eps
    xt = torch.from_numpy(x)
    x_S_x = (xt[:, None, :] * S[None] * xt[:, None, :]).sum(-1)
    x_r = (xt[:, None, :] * r[None]).sum(-1)
    exp_arg = (x_S_x + 2 * x_r) / (2 * eps) + log_alpha[None]
    ref = torch.logsumexp(exp_arg, dim=-1)

    ours = get_log_C(p, eps, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)


def test_log_potential_matches_torch_gmm():
    eps = 0.23
    p = _params(seed=2)
    x = np.random.RandomState(3).randn(7, 6).astype(np.float32)

    S = torch.exp(torch.from_numpy(np.asarray(p.S_log_diag)))
    r = torch.from_numpy(np.asarray(p.r))
    log_alpha = torch.from_numpy(np.asarray(p.log_alpha_raw)) / eps
    from torch.distributions import Categorical, Independent, MixtureSameFamily, Normal

    gmm = MixtureSameFamily(
        Categorical(logits=log_alpha),
        Independent(Normal(loc=r, scale=torch.sqrt(eps * S)), 1),
    )
    ref = gmm.log_prob(torch.from_numpy(x)) + torch.logsumexp(log_alpha, -1)

    ours = get_log_potential(p, eps, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_drift_matches_torch_autograd_reference():
    eps = 0.31
    p = _params(seed=4)
    x_np = np.random.RandomState(5).randn(3, 6).astype(np.float32)
    t_np = np.asarray([0.1, 0.4, 0.7], np.float32)

    # torch reference (sb.py:106-161, diagonal)
    x = torch.from_numpy(x_np).requires_grad_(True)
    t = torch.from_numpy(t_np)
    S_diag = torch.exp(torch.from_numpy(np.asarray(p.S_log_diag)))
    r = torch.from_numpy(np.asarray(p.r))
    log_alpha = torch.from_numpy(np.asarray(p.log_alpha_raw)) / eps
    A_diag = (t / (eps * (1 - t)))[:, None, None] + 1 / (eps * S_diag)[None]
    S_log_det = torch.from_numpy(np.asarray(p.S_log_diag)).sum(-1)
    A_log_det = torch.log(A_diag).sum(-1)
    c = ((1 / (eps * (1 - t)))[:, None] * x)[:, None, :] + (r / (eps * S_diag))[None]
    exp_arg = (
        log_alpha[None]
        - 0.5 * S_log_det[None]
        - 0.5 * A_log_det
        - 0.5 * ((r * (1 / S_diag) * r) / eps).sum(-1)[None]
        + 0.5 * (c * (1 / A_diag) * c).sum(-1)
    )
    lse = torch.logsumexp(exp_arg, dim=-1)
    (grad,) = torch.autograd.grad(lse.sum(), x)
    ref = -x.detach() / (1 - t[:, None]) + eps * grad

    ours = get_drift(p, eps, jnp.asarray(x_np), jnp.asarray(t_np))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_posterior_sampling_moments():
    """Sampled posterior matches the analytic mixture mean."""
    eps = 0.2
    p = _params(seed=6)
    x = jnp.asarray(np.random.RandomState(7).randn(2, 6).astype(np.float32))
    logits, r_x = _exp_argument(p, eps, x)
    w = jax.nn.softmax(logits, -1)
    analytic_mean = jnp.einsum("bn,bnd->bd", w, r_x)

    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    samples = jax.vmap(lambda k: sample_posterior(p, eps, x, k))(keys)
    emp_mean = samples.mean(0)
    np.testing.assert_allclose(
        np.asarray(emp_mean), np.asarray(analytic_mean), atol=0.05
    )


def test_euler_maruyama_shapes():
    p = _params()
    x = jnp.zeros((4, 6))
    traj = sample_euler_maruyama(p, 0.1, x, jax.random.PRNGKey(0), n_steps=5)
    assert traj.shape == (4, 6, 6)
    assert bool(jnp.isfinite(traj).all())


def test_deviation_loss_matches_reference_formula():
    y_pred = jnp.asarray([0.5, -1.0, 4.0, 6.0])
    y_true = jnp.asarray([0, 0, 1, 1])
    # inliers: |dev| = 0.5, 1.0 ; outliers: clamp(5-dev) = 1.0, 0.0
    expected = (0.5 + 1.0 + 1.0 + 0.0) / 4
    np.testing.assert_allclose(float(deviation_loss(y_pred, y_true)), expected)


def test_auroc():
    from train_ad import auroc

    scores = np.asarray([0.1, 0.4, 0.35, 0.8])
    labels = np.asarray([0, 0, 1, 1])
    # pairs: (0.35 vs 0.1 ✓), (0.35 vs 0.4 ✗), (0.8 vs both ✓✓) -> 3/4
    np.testing.assert_allclose(auroc(scores, labels), 0.75)


@pytest.fixture
def fake_mvtec(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    root = tmp_path / "mvtec"
    for split, classes, n in [
        ("train", ["good"], 12),
        ("test", ["good", "crack", "hole"], 4),
    ]:
        for cl in classes:
            d = root / "widget" / split / cl
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(
                    rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
                ).save(d / f"{i:03d}.png")
    return str(root)


def test_mvtecad_split_protocol(fake_mvtec):
    from ir_ads_tpu.anomaly.data import ADConfig, MVTecAD, balanced_batches

    cfg = ADConfig(
        dataset_root=fake_mvtec, classname="widget", know_class="crack",
        n_anomaly=2, img_size=32,
    )
    train = MVTecAD(cfg, train=True)
    test = MVTecAD(cfg, train=False)
    # train: 12 normals + 2 known 'crack' outliers
    assert len(train) == 14
    assert len(train.outlier_idx) == 2
    assert all("crack" in train.images[i] for i in train.outlier_idx)
    # test: 4 test-good normals + all 4 'hole' (unseen class) outliers
    assert len(test) == 8
    assert all("hole" in test.images[i] for i in test.outlier_idx)

    batch = next(iter(balanced_batches(train, 6, 1)))
    imgs, labels = batch
    assert imgs.shape == (6, 32, 32, 3)
    # 2:1 normal:outlier -> 2 known outliers (label 1); normals may be
    # replaced by pseudo-anomalies (label 2)
    assert (labels == 1).sum() == 2


def test_train_ad_end_to_end(fake_mvtec, monkeypatch, capsys):
    import sys

    import train_ad

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train_ad.py",
            "--dataset_root", fake_mvtec,
            "--classname", "widget",
            "--know_class", "crack",
            "--nAnomaly", "2",
            "--img_size", "32",
            "--batch_size", "6",
            "--steps_per_epoch", "2",
            "--epochs", "1",
            "--lightsb",
            "--sb_potentials", "2",
            "--output", os.path.join(fake_mvtec, "out"),
        ],
    )
    roc = train_ad.main()
    assert np.isfinite(roc)
    assert os.path.exists(os.path.join(fake_mvtec, "out", "widget_weights.msgpack"))


def test_lightsb_rotated_S():
    """Non-diagonal (QR-orthogonal) covariance path."""
    from ir_ads_tpu.anomaly.sb import (
        LightSBParams, get_S, get_drift, get_log_C, get_log_potential,
        sample_posterior,
    )

    rng = np.random.RandomState(0)
    dim, n = 4, 3
    p = LightSBParams(
        log_alpha_raw=jnp.asarray(rng.randn(n).astype(np.float32) * 0.1),
        r=jnp.asarray(rng.randn(n, dim).astype(np.float32)),
        S_log_diag=jnp.asarray(rng.randn(n, dim).astype(np.float32) * 0.2 - 1),
        S_rot_raw=jnp.asarray(rng.randn(n, dim, dim).astype(np.float32)),
    )
    eps = 0.2
    S = get_S(p, )
    assert S.shape == (n, dim, dim)
    # symmetric positive definite
    np.testing.assert_allclose(np.asarray(S), np.asarray(S).transpose(0, 2, 1),
                               atol=1e-5)
    assert (np.linalg.eigvalsh(np.asarray(S)) > 0).all()

    x = jnp.asarray(rng.randn(5, dim).astype(np.float32))
    assert np.isfinite(np.asarray(get_log_C(p, eps, x))).all()
    assert np.isfinite(np.asarray(get_log_potential(p, eps, x))).all()
    t = jnp.asarray([0.2, 0.5, 0.7, 0.1, 0.9])
    assert np.isfinite(np.asarray(get_drift(p, eps, x, t))).all()
    s = sample_posterior(p, eps, x, jax.random.PRNGKey(0))
    assert s.shape == x.shape and np.isfinite(np.asarray(s)).all()
