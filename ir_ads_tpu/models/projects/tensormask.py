"""SwapAlign2Nat — the TensorMask native op, as a pure-XLA gather.

Reference: detectron2/projects/TensorMask/tensormask/layers/csrc/
SwapAlign2Nat/SwapAlign2Nat_cuda.cu (forward indexing :54-158, shape math
:409-431) and the python wrapper layers/swap_align2nat.py:32-60.

Given mask predictions in the *aligned* representation, shape
(N, H, W, V*U) with V == U == sqrt(C), swap the unit lengths of the (V, U)
mask window and the (H, W) grid by the integer ratio ``lambda_val`` and
re-sample to the *natural* representation (N, ceil(H/λ), ceil(W/λ), (λV)*(λU)).
Each output element quadrilinearly interpolates the input at

    y' = y*λ + v - λV/2 + 0.5        v' = (v + 0.5)/λ - 0.5
    x' = x*λ + u - λU/2 + 0.5        u' = (u + 0.5)/λ - 0.5

with ``pad_val`` outside the tensor (default -6: sigmoid(-6) ≈ 0, i.e. no
mask).  The reference needs a hand-written CUDA backward
(SwapAlign2NatBackwardFeat); here JAX autodiff through the gathers yields the
identical scatter-add gradient for free.

Layout is NHWC (TPU-native) vs. the reference's NCHW.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gather4(x, yi, xi, vi, ui, hin, win, vin, uin, pad_val):
    """Gather x[:, yi, xi, vi, ui] (x shaped (N,H,W,V,U)) with pad outside."""
    inb = (
        (yi >= 0) & (yi < hin) & (xi >= 0) & (xi < win)
        & (vi >= 0) & (vi < vin) & (ui >= 0) & (ui < uin)
    )
    yc = jnp.clip(yi, 0, hin - 1)
    xc = jnp.clip(xi, 0, win - 1)
    vc = jnp.clip(vi, 0, vin - 1)
    uc = jnp.clip(ui, 0, uin - 1)
    vals = x[:, yc, xc, vc, uc]  # (N, Vout, Uout, Hout, Wout)
    return jnp.where(inb[None], vals, pad_val), inb


@partial(jax.jit, static_argnums=(1,))
def swap_align2nat(
    x: jax.Array, lambda_val: int, pad_val: float = -6.0
) -> jax.Array:
    """Apply SwapAlign2Nat.  x: (N, H, W, V*U) with V == U; returns
    (N, ceil(H/λ), ceil(W/λ), (λV)*(λU))."""
    assert lambda_val >= 1
    n, hin, win, c = x.shape
    vin = int(round(c ** 0.5))
    uin = c // vin
    assert vin * uin == c and vin == uin, "#channels must be a square number"
    lam = float(lambda_val)
    vout, uout = lambda_val * vin, lambda_val * uin
    hout = -(-hin // lambda_val)  # ceil
    wout = -(-win // lambda_val)

    xr = x.reshape(n, hin, win, vin, uin)

    v = jnp.arange(vout, dtype=jnp.float32)
    u = jnp.arange(uout, dtype=jnp.float32)
    y = jnp.arange(hout, dtype=jnp.float32)
    w = jnp.arange(wout, dtype=jnp.float32)
    vg, ug, yg, wg = jnp.meshgrid(v, u, y, w, indexing="ij")

    oy = yg * lam + vg - vout / 2.0 + 0.5
    ox = wg * lam + ug - uout / 2.0 + 0.5
    ov = (vg + 0.5) / lam - 0.5
    ou = (ug + 0.5) / lam - 0.5

    yf = jnp.floor(oy).astype(jnp.int32)
    xf = jnp.floor(ox).astype(jnp.int32)
    vf = jnp.floor(ov).astype(jnp.int32)
    uf = jnp.floor(ou).astype(jnp.int32)
    ywc, xwc = oy - yf, ox - xf
    vwc, uwc = ov - vf, ou - uf

    out = jnp.zeros((n, vout, uout, hout, wout), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            for dv in (0, 1):
                for du in (0, 1):
                    wgt = (
                        (ywc if dy else 1.0 - ywc)
                        * (xwc if dx else 1.0 - xwc)
                        * (vwc if dv else 1.0 - vwc)
                        * (uwc if du else 1.0 - uwc)
                    )
                    vals, _ = _gather4(
                        xr.astype(jnp.float32),
                        yf + dy, xf + dx, vf + dv, uf + du,
                        hin, win, vin, uin, pad_val,
                    )
                    out = out + wgt[None] * vals
    # (N, Vout, Uout, Hout, Wout) -> (N, Hout, Wout, Vout*Uout)
    out = out.transpose(0, 3, 4, 1, 2).reshape(n, hout, wout, vout * uout)
    return out.astype(x.dtype)


class SwapAlign2Nat:
    """Module-style wrapper mirroring the reference's nn.Module
    (swap_align2nat.py:32-60)."""

    def __init__(self, lambda_val: int, pad_val: float = -6.0):
        assert lambda_val >= 1, "lambda should be greater or equal to 1"
        self.lambda_val = lambda_val
        self.pad_val = pad_val

    def __call__(self, x: jax.Array) -> jax.Array:
        return swap_align2nat(x, self.lambda_val, self.pad_val)

    def __repr__(self):
        return (
            f"SwapAlign2Nat(lambda_val={self.lambda_val}, "
            f"pad_val={self.pad_val})"
        )
