"""The Pallas DSCF rpe-bias builder must match the XLA einsum formulation
(which itself is equivalence-tested against grid_sample semantics in
test_dscf_rpe.py / test_swin_parity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ir_ads_tpu.ops.pallas_dscf_rpe import (
    dscf_rpe_bias_pallas,
    dscf_rpe_bias_reference,
)


@pytest.mark.parametrize("h,w,g,hg", [(24, 32, 1, 2), (12, 16, 2, 2)])
def test_rpe_kernel_matches_reference(h, w, g, hg):
    b, m = 2, 8
    s1, s2 = 23, 31
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pos = jax.random.uniform(k1, (b * g, m, 2), jnp.float32, -1.0, 1.0)
    table = jax.random.normal(k2, (g, hg, s1, s2), jnp.float32)

    want = dscf_rpe_bias_reference(pos, table, h, w, out_dtype=jnp.float32)
    got = dscf_rpe_bias_pallas(
        pos, table, h, w, out_dtype=jnp.float32, j_chunk=4, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_rpe_reference_matches_module_formulation():
    """Cross-check against the DAttentionMM in-module rpe_bias math: the
    reference builder, transposed to the module's (B*g, HW, n, hg) layout,
    must equal the module's einsum output."""
    h, w, g, hg = 12, 16, 2, 2
    b, m = 2, 6
    s1, s2 = 19, 25
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    pos = jax.random.uniform(k1, (b * g, m, 2), jnp.float32, -1.0, 1.0)
    table = jax.random.normal(k2, (g, hg, s1, s2), jnp.float32)

    got = dscf_rpe_bias_reference(pos, table, h, w, out_dtype=jnp.float32)

    # module formulation (DAttentionMM.rpe_bias, head-minor=False layout)
    qy = jnp.arange(h, dtype=jnp.float32) / max(h - 1, 1) * 2.0 - 1.0
    qx = jnp.arange(w, dtype=jnp.float32) / max(w - 1, 1) * 2.0 - 1.0
    pf = pos
    iy = (0.5 * (qy[None, None, :] - pf[:, :, 0:1]) + 1.0) * 0.5 * (s1 - 1)
    ix = (0.5 * (qx[None, None, :] - pf[:, :, 1:2]) + 1.0) * 0.5 * (s2 - 1)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[..., None] - jnp.arange(s1, dtype=jnp.float32)))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[..., None] - jnp.arange(s2, dtype=jnp.float32)))
    # table layout in the module: (g, S1, S2, hg)
    tbl_module = table.transpose(0, 2, 3, 1)
    tb = jnp.broadcast_to(
        tbl_module[None], (b, g, s1, s2, hg)
    ).reshape(b * g, s1, s2, hg)
    u = jnp.einsum("bste,bnct->bncse", tb, wx)
    module_bias = jnp.einsum("bnrs,bncse->brcne", wy, u)  # (BG, h, w, n, hg)

    got_module_layout = got.transpose(0, 3, 4, 2, 1)  # (BG, h, w, m, hg)
    np.testing.assert_allclose(
        np.asarray(got_module_layout), np.asarray(module_bias),
        rtol=1e-4, atol=1e-4,
    )
