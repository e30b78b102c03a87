"""Legacy backbones (MiT CMNeXt-Bx, CMX) and extra decode heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # model-level: compile-dominated


@pytest.fixture(scope="module")
def pyramid():
    rng = np.random.RandomState(0)
    return [
        jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32)),
        jnp.asarray(rng.randn(2, 4, 4, 160).astype(np.float32)),
        jnp.asarray(rng.randn(2, 2, 2, 256).astype(np.float32)),
    ]


@pytest.mark.parametrize("head_name", ["uper", "fpn", "fcn", "lightham"])
def test_extra_heads_shapes(pyramid, head_name):
    from ir_ads_tpu.models.heads.extra_heads import (
        FCNHead,
        FPNHead,
        LightHamHead,
        UPerHead,
    )

    heads = {
        "uper": UPerHead(channel=32, num_classes=7),
        "fpn": FPNHead(channel=32, num_classes=7),
        "fcn": FCNHead(channel=32, num_classes=7),
        "lightham": LightHamHead(ham_channels=64, num_classes=7),
    }
    # fcn decodes only the last (lowest-res) feature; lightham starts at 1/8
    expected_hw = {"uper": 16, "fpn": 16, "fcn": 2, "lightham": 8}[head_name]
    head = heads[head_name]
    rngs = {"params": jax.random.PRNGKey(0), "nmf": jax.random.PRNGKey(1)}
    variables = head.init(rngs, pyramid)
    out = head.apply(variables, pyramid, rngs={"nmf": jax.random.PRNGKey(2)})
    assert out.shape == (2, expected_hw, expected_hw, 7)
    assert bool(jnp.isfinite(out).all())


def test_cond_head(pyramid):
    from ir_ads_tpu.models.heads.extra_heads import CondHead

    head = CondHead(channel=32, num_classes=7)
    variables = head.init(jax.random.PRNGKey(0), pyramid)
    out = head.apply(variables, pyramid)
    assert out.shape == (2, 2, 2, 7)
    guid, seg = head.apply(
        variables, pyramid, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )[0]
    assert guid.shape == seg.shape == (2, 2, 2, 7)


def test_adaptive_avg_pool_matches_torch():
    import torch
    from ir_ads_tpu.models.heads.extra_heads import _adaptive_avg_pool

    rng = np.random.RandomState(1)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    for s in (1, 2, 3, 6):
        ours = _adaptive_avg_pool(jnp.asarray(x), s)
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), s
        ).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_mit_dual_stream_forward():
    from ir_ads_tpu.models.backbones.mit import MiTDualStream

    m = MiTDualStream(variant="B0")
    rgb = jnp.zeros((1, 64, 64, 3))
    dte = jnp.ones((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    outs = m.apply(v, rgb, dte)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 160), (1, 2, 2, 256)
    ]
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_cmx_forward():
    from ir_ads_tpu.models.backbones.cmx import CMX

    m = CMX(variant="B0")
    rgb = jnp.zeros((1, 64, 64, 3))
    dte = jnp.ones((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    outs, mut = m.apply(v, rgb, dte, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(1)})
    assert [o.shape[-1] for o in outs] == [32, 64, 160, 256]


def test_legacy_model_wrapper():
    from ir_ads_tpu.models import build_model

    m = build_model("CMNeXt", "CMNeXt-B0", num_classes=5)
    rgb = jnp.zeros((1, 64, 64, 3))
    dte = jnp.ones((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    y, y_rgb, y_dte = m.apply(v, rgb, dte)
    assert y.shape == (1, 64, 64, 5)


@pytest.mark.parametrize("head_name", ["sfnet", "fapn", "lawin"])
def test_alignment_heads(pyramid, head_name):
    from ir_ads_tpu.models.heads.align_heads import FaPNHead, LawinHead, SFHead

    heads = {
        "sfnet": SFHead(channel=32, num_classes=7),
        "fapn": FaPNHead(channel=32, num_classes=7),
        "lawin": LawinHead(embed_dim=32, num_classes=7, patch=4),
    }
    head = heads[head_name]
    variables = head.init({"params": jax.random.PRNGKey(0)}, pyramid)
    out = head.apply(variables, pyramid)
    assert out.shape == (2, 16, 16, 7)
    assert bool(jnp.isfinite(out).all())
