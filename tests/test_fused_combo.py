"""Whole-backbone equality with ALL fused eval kernels enabled at once
(v4 attention half-block + fused block tail + pallas3 DSCF, interpret
mode) vs the pure-XLA path — catches wiring bugs (stream splits, pad
geometry, param routing) that single-kernel tests can't."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.models.backbones.swin import SwinTransformer

FUSED_ENV = {
    "IR_ADS_SWIN_ATTN": "pallas4",
    "IR_ADS_FFN": "fused",
    "IR_ADS_DSCF_ATTN": "pallas3",
    "IR_ADS_PALLAS_INTERPRET": "1",
}
XLA_ENV = {
    "IR_ADS_SWIN_ATTN": "xla",
    "IR_ADS_FFN": "xla",
    "IR_ADS_DSCF_ATTN": "xla",
}


def _set_env(env):
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    return saved


def _restore_env(keys, saved):
    for k in keys:
        old = saved.get(k)
        if old is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = old


@pytest.mark.slow
@pytest.mark.parametrize("dual_batch", [False, True])
def test_backbone_all_fused_matches_xla(dual_batch):
    model = SwinTransformer(
        embed_dim=32,
        depths=(1, 2),
        num_heads=(2, 4),
        window_size=4,
        drop_path_rate=0.0,
        dscf_strides=(2, 1),
        dscf_groups=(1, 2),
        dscf_heads=(2, 4),
        out_indices=(0, 1),
        dual_batch=dual_batch,
        mmst_mask=False,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # 28x36 input -> stage maps 7x9 (pad to 8x12 at ws=4): exercises the
    # pad-zeroing + shift path of the v4 kernel inside the full model
    rgb = jax.random.normal(k1, (2, 28, 36, 3), jnp.float32)
    dte = jax.random.normal(k2, (2, 28, 36, 3), jnp.float32)

    keys = set(FUSED_ENV) | set(XLA_ENV)
    saved = {k: os.environ.get(k) for k in keys}
    try:
        _set_env(XLA_ENV)
        os.environ.pop("IR_ADS_PALLAS_INTERPRET", None)
        v = model.init({"params": jax.random.PRNGKey(1)}, rgb, dte)
        outs_xla = model.apply(v, rgb, dte, train=False)
        _set_env(FUSED_ENV)
        outs_fused = model.apply(v, rgb, dte, train=False)
    finally:
        _restore_env(keys, saved)
        os.environ.pop("IR_ADS_PALLAS_INTERPRET", None)

    for which, (a, b) in enumerate(zip(outs_xla, outs_fused)):
        for lvl, (ta, tb) in enumerate(zip(a, b)):
            np.testing.assert_allclose(
                np.asarray(ta),
                np.asarray(tb),
                atol=2e-4,
                rtol=1e-4,
                err_msg=f"pyramid {which} level {lvl}",
            )
