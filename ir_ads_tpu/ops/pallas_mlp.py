"""Fused Swin block tail: ``out = x + MLP(LN(x)) + 0.5 * Adapter(x)``.

Reference semantics: SwinBlockAdapter's norm2 → FFN (+identity) → +0.5·adapter
branch (reference swin.py:505-610 block wiring; mmcv FFN add_identity).

Why a kernel: the whole backbone is HBM-bound (dev/roofline.py).  The XLA
path moves ~19 activation-map passes per block through HBM for this tail
(LN read/write, the 4C-wide FFN hidden both ways, adapter branch, three
residual adds); this kernel reads x once and writes the result once — the
LN statistics, the (rows, 4C) hidden, and the adapter branch all live in
VMEM.  Weight blocks use constant index maps so Mosaic keeps them resident
across row tiles.  Eval-path only (dropout/drop-path fall back to XLA in
the caller); backward is XLA recompute of the reference twin.

Numerics: LN statistics and matmul accumulation in f32; the FFN hidden is
rounded to the compute dtype between the two matmuls exactly where the
unfused path rounds (Dense_0 output).  GELU uses the tanh approximation
(flax nn.gelu default) computed in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _tail_kernel(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    aw1_ref, ab1_ref, aw2_ref, ab2_ref, o_ref, *, eps, adapter_scale,
):
    x = x_ref[...].astype(jnp.float32)  # (TR, C)
    # LayerNorm (f32 statistics, like flax LayerNorm under dtype=bf16)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    cdt = w1_ref.dtype
    xn = xn.astype(cdt)
    # FFN: round the hidden to the compute dtype where Dense_0 rounds
    h = jax.lax.dot_general(
        xn, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True).astype(cdt)
    ffn = jax.lax.dot_general(
        h, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    # Adapter branch (input is x itself, not LN(x); relu; no skip)
    a = jax.lax.dot_general(
        x.astype(cdt), aw1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ab1_ref[...].astype(jnp.float32)
    a = jnp.maximum(a, 0.0).astype(cdt)
    a = jax.lax.dot_general(
        a, aw2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ab2_ref[...].astype(jnp.float32)
    o_ref[...] = (x + ffn + adapter_scale * a).astype(o_ref.dtype)


def _tail_kernel_int8(
    x_ref, g_ref, b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    aw1_ref, ab1_ref, aw2_ref, ab2_ref, o_ref, *, eps, adapter_scale,
):
    """w8a8 tail: the two FFN dots run s8 x s8 -> s32 on the MXU (~2x the
    bf16 rate on v5e).  Weights arrive pre-quantized (per-output-channel
    symmetric, scales s1/s2); activations are quantized per ROW in VMEM
    (dynamic abs-max — exact to factor out of the dot).  The adapter branch
    (C -> C/16 -> C, ~3% of tail FLOPs) stays in the compute dtype.
    Numerics: matches ops.int8.quantized_matmul (tests/test_pallas_int8.py).
    """
    x = x_ref[...].astype(jnp.float32)  # (TR, C)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    cdt = aw1_ref.dtype
    # rounding point parity with the float kernel: the unfused path rounds
    # LN output to the compute dtype before Dense_0 reads it
    xn = xn.astype(cdt).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xn), axis=1, keepdims=True), 1e-12) / 127.0
    xq = jnp.round(xn / sx).astype(jnp.int8)
    h = jax.lax.dot_general(
        xq, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sx * s1_ref[...].astype(jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True), 1e-12) / 127.0
    hq = jnp.round(h / sh).astype(jnp.int8)
    ffn = jax.lax.dot_general(
        hq, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sh * s2_ref[...].astype(jnp.float32)
    ffn = ffn + b2_ref[...].astype(jnp.float32)
    a = jax.lax.dot_general(
        x.astype(cdt), aw1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ab1_ref[...].astype(jnp.float32)
    a = jnp.maximum(a, 0.0).astype(cdt)
    a = jax.lax.dot_general(
        a, aw2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ab2_ref[...].astype(jnp.float32)
    o_ref[...] = (x + ffn + adapter_scale * a).astype(o_ref.dtype)


def quantize_weight(w: jax.Array):
    """Per-output-channel symmetric int8: returns (w_q (K, N) s8, s (1, N))."""
    s = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0,
                            keepdims=True), 1e-12) / 127.0
    return jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(
        jnp.int8
    ), s


def _pick_tile(n: int, hidden: int) -> int:
    """Row tile: keep the (TR, 4C) f32 hidden under ~8 MB, TR multiple of 8."""
    budget = 8 * 1024 * 1024
    tr = 1024
    while tr > 8 and tr * max(hidden, 128) * 4 > budget:
        tr //= 2
    return min(tr, _round_up(n, 8))


def fused_block_tail_pallas(
    x: jax.Array,        # (N, C)
    ln_scale: jax.Array,  # (C,)
    ln_bias: jax.Array,
    w1: jax.Array,       # (C, H)
    b1: jax.Array,
    w2: jax.Array,       # (H, C)
    b2: jax.Array,
    aw1: jax.Array,      # (C, Ca)
    ab1: jax.Array,
    aw2: jax.Array,      # (Ca, C)
    ab2: jax.Array,
    eps: float = 1e-5,
    adapter_scale: float = 0.5,
    interpret: bool = False,
) -> jax.Array:
    import os

    interpret = interpret or os.environ.get("IR_ADS_PALLAS_INTERPRET") == "1"
    n, c = x.shape
    hidden = w1.shape[1]
    ca = aw1.shape[1]
    tr = _pick_tile(n, hidden)
    n_pad = _round_up(n, tr)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    cdt = x.dtype
    vec = lambda v: v.reshape(1, -1).astype(cdt)  # noqa: E731
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    from ir_ads_tpu.ops.int8 import int8_enabled

    if int8_enabled():
        w1q, s1 = quantize_weight(w1)
        w2q, s2 = quantize_weight(w2)
        out = pl.pallas_call(
            functools.partial(
                _tail_kernel_int8, eps=eps, adapter_scale=adapter_scale
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad, c), x.dtype),
            grid=(n_pad // tr,),
            in_specs=[
                pl.BlockSpec((tr, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                full(1, c), full(1, c),
                full(c, hidden), full(1, hidden), full(1, hidden),
                full(hidden, c), full(1, c), full(1, c),
                full(c, ca), full(1, ca),
                full(ca, c), full(1, c),
            ],
            out_specs=pl.BlockSpec(
                (tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            x, vec(ln_scale), vec(ln_bias),
            w1q, s1, vec(b1), w2q, s2, vec(b2),
            aw1.astype(cdt), vec(ab1), aw2.astype(cdt), vec(ab2),
        )
        return out[:n]
    out = pl.pallas_call(
        functools.partial(
            _tail_kernel, eps=eps, adapter_scale=adapter_scale
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x.dtype),
        grid=(n_pad // tr,),
        in_specs=[
            pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(1, c), full(1, c),
            full(c, hidden), full(1, hidden),
            full(hidden, c), full(1, c),
            full(c, ca), full(1, ca),
            full(ca, c), full(1, c),
        ],
        out_specs=pl.BlockSpec(
            (tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, vec(ln_scale), vec(ln_bias),
        w1.astype(cdt), vec(b1), w2.astype(cdt), vec(b2),
        aw1.astype(cdt), vec(ab1), aw2.astype(cdt), vec(ab2),
    )
    return out[:n]


def block_tail_reference(
    x, ln_scale, ln_bias, w1, b1, w2, b2, aw1, ab1, aw2, ab2,
    eps=1e-5, adapter_scale=0.5,
):
    """XLA twin (same rounding points); also the backward."""
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = (
        xn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    ).astype(cdt)
    h = (
        jnp.dot(xn, w1.astype(cdt), preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32)
    )
    h = jax.nn.gelu(h, approximate=True).astype(cdt)
    ffn = (
        jnp.dot(h, w2.astype(cdt), preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32)
    )
    a = (
        jnp.dot(x, aw1.astype(cdt), preferred_element_type=jnp.float32)
        + ab1.astype(jnp.float32)
    )
    a = jnp.maximum(a, 0.0).astype(cdt)
    a = (
        jnp.dot(a, aw2.astype(cdt), preferred_element_type=jnp.float32)
        + ab2.astype(jnp.float32)
    )
    return (xf + ffn + adapter_scale * a).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_block_tail(
    x, ln_scale, ln_bias, w1, b1, w2, b2, aw1, ab1, aw2, ab2,
    eps=1e-5, adapter_scale=0.5,
):
    """Differentiable entry: Pallas forward + XLA-recompute backward."""
    return fused_block_tail_pallas(
        x, ln_scale, ln_bias, w1, b1, w2, b2, aw1, ab1, aw2, ab2,
        eps=eps, adapter_scale=adapter_scale,
    )


def _tail_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, aw1, ab1, aw2, ab2,
              eps, adapter_scale):
    out = fused_block_tail_pallas(
        x, ln_scale, ln_bias, w1, b1, w2, b2, aw1, ab1, aw2, ab2,
        eps=eps, adapter_scale=adapter_scale,
    )
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, aw1, ab1, aw2, ab2)


def _tail_bwd(eps, adapter_scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: block_tail_reference(
            *a, eps=eps, adapter_scale=adapter_scale
        ),
        *res,
    )
    return vjp(g)


fused_block_tail.defvjp(_tail_fwd, _tail_bwd)
