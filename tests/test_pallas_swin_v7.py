"""v7 banded full-block kernel (attention half + fused tail, one kernel).

Contract: pallas7 output is BITWISE the fused_window_block (v4) ->
fused_block_tail composition it replaces (the attention-half residual is
rounded to the map dtype before the tail, exactly like the two-kernel
pipeline), and matches the pure-XLA module path to f32 tolerance.
Gradients flow through the XLA-recompute backward.
Reference block semantics: swin.py:505-610."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.models.backbones.swin import SwinStage

BASE_ENV = {"IR_ADS_PALLAS_INTERPRET": "1"}


@pytest.fixture()
def _env():
    keys = list(BASE_ENV) + ["IR_ADS_SWIN_ATTN", "IR_ADS_FFN"]
    saved = {k: os.environ.get(k) for k in keys}
    os.environ.update(BASE_ENV)
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def _run(attn, ffn, sub_mode="rgb", grad=False):
    os.environ["IR_ADS_SWIN_ATTN"] = attn
    os.environ["IR_ADS_FFN"] = ffn
    stage = SwinStage(
        dim=32, depth=2, num_heads=4, ffn_dim=64, window_size=4,
        drop_rate=0.0, drop_path_rates=[0.0] * 2, downsample=False,
        stage_idx=0,
    )
    b = 4 if sub_mode == "dual" else 2
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, 6, 7, 32)), jnp.float32
    )
    v = stage.init({"params": jax.random.PRNGKey(0)}, x, sub_mode)
    y, _ = stage.apply(v, x, sub_mode)
    g = None
    if grad:
        g = jax.grad(
            lambda vv: jnp.sum(stage.apply(vv, x, sub_mode)[0])
        )(v)
    return y, g


@pytest.mark.slow  # ~13 s; the dual-stacked-adapters test keeps v7
# covered in the fast tier
def test_v7_bitwise_vs_v4_tail_composition(_env):
    y7, _ = _run("pallas7", "fused")
    y4, _ = _run("pallas4", "fused")
    assert bool(jnp.all(y7 == y4)), float(jnp.max(jnp.abs(y7 - y4)))


@pytest.mark.slow  # 31 s; v7 is an experimental config (prod = pallas4/6)
def test_v7_matches_xla_and_grads(_env):
    y7, g7 = _run("pallas7", "fused", grad=True)
    yx, gx = _run("xla", "xla", grad=True)
    assert float(jnp.max(jnp.abs(y7 - yx))) < 1e-5
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g7, gx
    )
    assert max(jax.tree_util.tree_leaves(d)) < 1e-4


def test_v7_dual_stacked_adapters(_env):
    y7, _ = _run("pallas7", "fused", sub_mode="dual")
    yx, _ = _run("xla", "xla", sub_mode="dual")
    assert float(jnp.max(jnp.abs(y7 - yx))) < 1e-5
