"""DSCF rpe-bias: separable-matmul formulation == gather (grid_sample)
formulation, exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from ir_ads_tpu.ops.grid_sample import grid_sample, make_ref_grid


def test_separable_rpe_equals_grid_sample():
    rng = np.random.RandomState(0)
    bg, hk, wk = 3, 4, 5
    h, w = 12, 10
    s1, s2 = 17, 21
    hg = 2
    n = hk * wk
    table = jnp.asarray(rng.randn(bg, s1, s2, hg).astype(np.float32))
    pos = jnp.clip(
        jnp.asarray(rng.randn(bg, hk, wk, 2).astype(np.float32)) * 0.5, -1, 1
    )

    # gather reference (the reference DAttentionMM formulation)
    q_grid = make_ref_grid(h, w, 1, centered=False)[0].reshape(h * w, 2)
    disp = (q_grid[None, :, None, :] - pos.reshape(bg, 1, n, 2)) * 0.5
    ref = grid_sample(table, disp[..., ::-1], align_corners=True)

    # separable formulation (mirrors DAttentionMM.rpe_bias)
    qy = jnp.arange(h, dtype=jnp.float32) / (h - 1) * 2 - 1
    qx = jnp.arange(w, dtype=jnp.float32) / (w - 1) * 2 - 1
    pf = pos.reshape(bg, n, 2)
    iy = (0.5 * (qy[None, None, :] - pf[:, :, 0:1]) + 1.0) * 0.5 * (s1 - 1)
    ix = (0.5 * (qx[None, None, :] - pf[:, :, 1:2]) + 1.0) * 0.5 * (s2 - 1)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[..., None] - jnp.arange(s1, dtype=jnp.float32)))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[..., None] - jnp.arange(s2, dtype=jnp.float32)))
    u = jnp.einsum("bste,bnct->bncse", table, wx)
    ours = jnp.einsum("bnrs,bncse->brcne", wy, u).reshape(bg, h * w, n, hg)

    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)
