"""Hoisted rel-pos-bias scan input (IR_ADS_SWIN_HOIST_BIAS).

SwinStage precomputes the dense per-pair biases OUTSIDE the deep-stage
nn.scan (one batched gather over the stacked tables) and threads them as
scanned xs; the blocks must produce BITWISE the per-iteration-gather
result, and the table must keep receiving gradients through the hoisted
path (it feeds the kernels via self.variables, not via the normal param
read).  Reference semantics: swin.py:64-69 (bias index)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.models.backbones.swin import SwinStage

ENV = {
    "IR_ADS_PALLAS_INTERPRET": "1",
    "IR_ADS_SWIN_ATTN": "pallas6",
    "IR_ADS_FFN": "fused",
}


@pytest.fixture()
def _env():
    saved = {k: os.environ.get(k) for k in ENV}
    os.environ.update(ENV)
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def _stage():
    return SwinStage(
        dim=32, depth=4, num_heads=4, ffn_dim=64, window_size=4,
        drop_rate=0.0, drop_path_rates=[0.0] * 4, downsample=False,
        stage_idx=2,
    )


@pytest.mark.slow  # ~30-95 s: fast tier stays under its 10-min budget
def test_hoisted_bias_bitwise_and_grads(_env):
    stage = _stage()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 6, 7, 32)), jnp.float32
    )
    v = stage.init({"params": jax.random.PRNGKey(0)}, x, "rgb")

    os.environ["IR_ADS_SWIN_HOIST_BIAS"] = "1"
    y1, _ = stage.apply(v, x, "rgb")
    os.environ["IR_ADS_SWIN_HOIST_BIAS"] = "0"
    y0, _ = stage.apply(v, x, "rgb")
    os.environ.pop("IR_ADS_SWIN_HOIST_BIAS", None)
    assert bool(jnp.all(y1 == y0)), float(jnp.max(jnp.abs(y1 - y0)))

    os.environ["IR_ADS_SWIN_HOIST_BIAS"] = "1"
    try:
        g = jax.grad(lambda vv: jnp.sum(stage.apply(vv, x, "rgb")[0]))(v)
    finally:
        os.environ.pop("IR_ADS_SWIN_HOIST_BIAS", None)
    t = g["params"]["pairs"]["block0"]["attn"]["w_msa"]["rel_pos_bias_table"]
    assert t.shape[0] == 2  # stacked over scan iterations
    assert bool(jnp.any(t != 0))
