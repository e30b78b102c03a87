"""End-to-end numerical parity: our flax CMNeXt vs the torch reference
implementation (tests/utils/torch_swin_ref.py), weights transferred through
ir_ads_tpu.utils.torch_import — exercising the checkpoint importer and the
full dual-stream model math in one test.

This is the rebuild's answer to SURVEY.md §7 "hard parts #1": numerical
parity of the Swin dual-stream backbone under checkpoint import.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from ir_ads_tpu.models.cmnext import CMNeXt
from ir_ads_tpu.utils.torch_import import import_cmnext_state_dict
from tests.utils.torch_swin_ref import CMNeXtRef
import pytest

pytestmark = pytest.mark.slow  # model-level: compile-dominated

# depth-4 stage exercises the scan-over-block-pairs path + stacked import
TINY = dict(
    embed_dim=16,
    depths=(1, 4, 1, 1),
    num_heads=(1, 2, 4, 8),
    window_size=4,
    drop_path_rate=0.0,
)


def _rand_init_torch(model: torch.nn.Module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, buf in model.named_buffers():
            if "running_var" in name:
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)
            elif "running_mean" in name:
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)


def test_cmnext_parity_with_torch_reference():
    tref = CMNeXtRef(
        embed_dim=16, depths=(1, 4, 1, 1), heads=(1, 2, 4, 8), ws=4,
        num_classes=5, head_dims=(32, 16),
    )
    _rand_init_torch(tref)
    tref.eval()

    rng = np.random.RandomState(0)
    rgb = rng.randn(2, 64, 80, 3).astype(np.float32)
    dte = rng.randn(2, 64, 80, 3).astype(np.float32)

    with torch.no_grad():
        ty, ty_rgb, ty_dte = tref(
            torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(dte).permute(0, 3, 1, 2),
        )

    model = CMNeXt(
        backbone="SwinTransformer-B", num_classes=5,
        backbone_kwargs=TINY, head_dims=(32, 16), mmst_mask=False,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(rgb), jnp.asarray(dte),
    )
    sd = {k: v.detach().numpy() for k, v in tref.state_dict().items()}
    variables, warnings = import_cmnext_state_dict(sd, variables)
    real_warnings = [w for w in warnings if "relative_position_index" not in w]
    assert not real_warnings, f"import warnings: {real_warnings[:10]}"

    y, y_rgb, y_dte = model.apply(
        variables, jnp.asarray(rgb), jnp.asarray(dte), train=False
    )

    np.testing.assert_allclose(
        np.asarray(y), ty.permute(0, 2, 3, 1).numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(y_rgb), ty_rgb.permute(0, 2, 3, 1).numpy(), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(y_dte), ty_dte.permute(0, 2, 3, 1).numpy(), atol=2e-3, rtol=1e-3
    )
