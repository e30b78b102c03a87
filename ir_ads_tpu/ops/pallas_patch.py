"""Fused patch-embed kernel: FLAT patchify + projection + LayerNorm.

The FLAT (B, H, W*C) input feed (round-4) made the device input buffer
lane-dense, but PatchEmbed's XLA path still materializes the patchify
relayout (B, H/p, W/p, p*p*C) in HBM before the projection matmul —
~0.8 ms/forward of the round-4 per-fusion profile's patch-embed glue
(COVERAGE.md "patch-embed input glue").  This kernel does the relayout in
VMEM: one HBM read of a band of input rows, patchify as a VMEM reshape/
transpose, one MXU dot, LayerNorm, one HBM write of the embedded band.

Opt-in via IR_ADS_PATCH_EMBED=pallas (consumed by ops.layers.PatchEmbed);
numerics match the XLA path to compute-dtype rounding (same f32 matmul
accumulation and f32 LN statistics; tests/test_flat_input.py).

Reference semantics: semseg/models/backbones/embed.py:83-204 (conv
patchify, kernel == stride) — here re-expressed as reshape + matmul.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_kernel(
    x_ref, w_ref, b_ref, g_ref, be_ref, o_ref, *, p, c, eps, use_norm
):
    """x: (1, rb*p, W*C) band of FLAT input rows; w: (p*p*C, E); b: (1, E);
    g/be: (1, E) LN scale/bias; o: (1, rb, W/p, E)."""
    x = x_ref[0]  # (rb*p, W*C)
    rhp, wc = x.shape
    rb = rhp // p
    w = wc // c
    wp = w // p
    e = w_ref.shape[1]
    cdt = w_ref.dtype
    # patchify: (rb, p, wp, p*c) -> (rb, wp, p, p*c) -> (rb*wp, p*p*c).
    # Slice order (p_row, x_in_patch, c) matches the torch-unfold kernel
    # reshape (see PatchEmbed flat path) so the SAME weights apply.
    xp = (
        x.reshape(rb, p, wp, p * c)
        .transpose(0, 2, 1, 3)
        .reshape(rb * wp, p * p * c)
    )
    y = jax.lax.dot_general(
        xp.astype(cdt), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (y.astype(cdt) + b_ref[...].astype(cdt)).astype(cdt)
    if use_norm:
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, axis=1, keepdims=True)
        yc = yf - mu
        var = jnp.mean(yc * yc, axis=1, keepdims=True)
        yn = yc * jax.lax.rsqrt(var + eps)
        y = (
            yn * g_ref[...].astype(jnp.float32)
            + be_ref[...].astype(jnp.float32)
        ).astype(cdt)
    o_ref[0] = y.reshape(rb, wp, e)


def pallas_patch_embed(
    x: jax.Array,            # (B, H, W*C) FLAT, already padded to p
    wk2: jax.Array,          # (p*p*C, E) reshaped conv kernel
    bias: jax.Array,         # (E,)
    ln_scale: Optional[jax.Array],  # (E,) or None (use_norm=False)
    ln_bias: Optional[jax.Array],
    p: int,
    c: int,
    eps: float = 1e-5,
    rows_block: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    import os

    interpret = interpret or os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1"
    b, h, wc = x.shape
    hp, w = h // p, wc // c // p
    use_norm = ln_scale is not None
    cdt = x.dtype
    if rows_block is None:
        want = int(os.environ.get("IR_ADS_PATCH_ROWS", "8"))
        rows_block = max(
            r for r in range(1, hp + 1) if hp % r == 0 and r <= want
        )
    nb = hp // rows_block
    e = wk2.shape[1]
    vec = lambda v: v.reshape(1, -1).astype(cdt)  # noqa: E731
    if not use_norm:
        ln_scale = jnp.ones((e,), cdt)
        ln_bias = jnp.zeros((e,), cdt)

    def wspec(*shape):
        return pl.BlockSpec(
            shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        functools.partial(
            _patch_kernel, p=p, c=c, eps=eps, use_norm=use_norm
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, e), cdt),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(
                (1, rows_block * p, wc), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec(p * p * c, e), wspec(1, e), wspec(1, e), wspec(1, e),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_block, w, e), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, wk2.astype(cdt), vec(bias), vec(ln_scale), vec(ln_bias))


def _xla_twin(x, wk2, bias, ln_scale, ln_bias, p, c, eps):
    """XLA reference with the same rounding points (also the backward)."""
    b, h, wc = x.shape
    w = wc // c
    cdt = wk2.dtype
    xp = (
        x.reshape(b, h // p, p, w // p, p * c)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h // p, w // p, p * p * c)
    ).astype(cdt)
    y = xp @ wk2.astype(cdt) + bias.astype(cdt)
    if ln_scale is not None:
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, axis=-1, keepdims=True)
        yc = yf - mu
        var = jnp.mean(yc * yc, axis=-1, keepdims=True)
        y = (
            yc * jax.lax.rsqrt(var + eps) * ln_scale.astype(jnp.float32)
            + ln_bias.astype(jnp.float32)
        ).astype(cdt)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_patch_embed(
    x, wk2, bias, ln_scale, ln_bias, p, c, use_norm=True, eps=1e-5
):
    """pallas_patch_embed forward + XLA-recompute backward.  ln_scale/
    ln_bias must be real arrays (ignored when use_norm=False)."""
    return pallas_patch_embed(
        x, wk2, bias, ln_scale if use_norm else None,
        ln_bias if use_norm else None, p, c, eps,
    )


def _fpe_fwd(x, wk2, bias, ln_scale, ln_bias, p, c, use_norm, eps):
    out = pallas_patch_embed(
        x, wk2, bias, ln_scale if use_norm else None,
        ln_bias if use_norm else None, p, c, eps,
    )
    return out, (x, wk2, bias, ln_scale, ln_bias)


def _fpe_bwd(p, c, use_norm, eps, res, g):
    x, wk2, bias, ln_scale, ln_bias = res
    _, vjp = jax.vjp(
        lambda *a: _xla_twin(
            a[0], a[1], a[2],
            a[3] if use_norm else None, a[4] if use_norm else None,
            p, c, eps,
        ),
        x, wk2, bias, ln_scale, ln_bias,
    )
    return vjp(g)


fused_patch_embed.defvjp(_fpe_fwd, _fpe_bwd)
