"""Swin-L variant exercise (VERDICT r1 weak item 8): the reference ships
Swin-L first-class with gradient checkpointing (base.py:46-51, swin.py
with_cp), which is exactly where nn.scan + nn.remat interactions break."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.models.backbones.swin import swin_l
from ir_ads_tpu.models.cmnext import CMNeXt


def test_swin_l_defaults():
    m = swin_l()
    assert m.embed_dim == 192
    assert tuple(m.num_heads) == (6, 12, 24, 48)
    assert m.use_remat


@pytest.mark.slow
def test_scan_remat_train_step_tiny_dims():
    """remat'd scanned block pairs must trace, run and differentiate (the
    deep-stage code path Swin-L uses), on small dims for speed."""
    model = CMNeXt(
        backbone="SwinTransformer-L", num_classes=5,
        backbone_kwargs=dict(
            embed_dim=16, depths=(1, 1, 4, 1), num_heads=(1, 2, 4, 8),
            window_size=4, drop_path_rate=0.1,
        ),
        head_dims=(32, 16), use_remat=True, mmst_mask=False,
    )
    rgb = jnp.zeros((1, 32, 32, 3))
    dte = jnp.zeros((1, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        rgb, dte, train=True,
    )

    def loss(params):
        y, out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            rgb, dte, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(y[0] ** 2)

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert bool(jnp.isfinite(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)


@pytest.mark.slow
def test_swin_l_real_dims_forward():
    """Real Swin-L dims (embed 192, heads (6,12,24,48), window 12, remat +
    18-block scan) — forward at a reduced spatial size."""
    model = CMNeXt(
        backbone="SwinTransformer-L", num_classes=25, mmst_mask=False,
        dtype=jnp.bfloat16,
    )
    rgb = jnp.zeros((1, 96, 128, 3), jnp.float32)
    dte = jnp.zeros((1, 96, 128, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, rgb, dte)
    )()
    y = model.apply(variables, rgb, dte, train=False)[0]
    assert y.shape == (1, 96, 128, 25)
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))
