"""Alternative backbones + lazy config."""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # model-level: compile-dominated


@pytest.mark.parametrize(
    "name", ["convnext", "focalnet", "vit", "internimage"]
)
def test_alt_backbone_forward(name):
    from ir_ads_tpu.models.backbones.alt_backbones import (
        ConvNeXt,
        FocalNet,
        InternImage,
        ViT,
    )

    models = {
        "convnext": ConvNeXt(depths=(1, 1, 2, 1), dims=(16, 32, 48, 64)),
        "focalnet": FocalNet(depths=(1, 1, 1, 1), dims=(16, 32, 48, 64)),
        "vit": ViT(dim=32, depth=2, num_heads=2),
        "internimage": InternImage(
            depths=(1, 1, 1, 1), dims=(16, 32, 64, 128), groups=(2, 4, 8, 16)
        ),
    }
    m = models[name]
    x = jnp.ones((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    outs = m.apply(v, x)
    assert all(bool(jnp.isfinite(o).all()) for o in outs.values())
    if name != "vit":
        assert set(outs) == {"res2", "res3", "res4", "res5"}


def test_lazy_config(tmp_path):
    from ir_ads_tpu.utils.lazy_config import instantiate, load_py_config

    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(
        "from ir_ads_tpu.utils.lazy_config import L\n"
        "def make(x, y=2):\n    return ('made', x, y)\n"
        "model = L(make)(x=1)\n"
        "train = dict(lr=0.1, sched=dict(warmup=5))\n"
    )
    cfg = load_py_config(str(cfg_file), ["train.lr=0.5", "model.y=7"])
    assert cfg["train"]["lr"] == 0.5
    assert instantiate(cfg["model"]) == ("made", 1, 7)


def test_regnet_forward():
    from ir_ads_tpu.models.backbones.regnet import RegNet, regnet_widths

    widths, depths = regnet_widths(24, 24.48, 2.54, 22)
    assert len(widths) == 4 and sum(depths) == 22

    m = RegNet(variant="regnetx_400mf")
    x = jnp.ones((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    outs = m.apply(v, x)
    assert set(outs) == {"res2", "res3", "res4", "res5"}
    assert outs["res5"].shape[1] == 2  # stride 32
