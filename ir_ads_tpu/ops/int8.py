"""Int8 MXU matmuls for the Swin trunk (the stated path to the 5x north
star — VERDICT r1 item 4).

v5e runs s8 x s8 -> s32 on the MXU at ~2x the bf16 rate (394 vs 197
TOPS).  ``QuantDense`` is a drop-in for nn.Dense with IDENTICAL parameter
names/shapes ("kernel"/"bias" in full precision, so checkpoints import
unchanged); at apply time it quantizes

  * weights  per-output-channel symmetric int8 (abs-max scaling), and
  * activations per-token symmetric int8 (dynamic abs-max over the feature
    axis),

runs the integer dot with int32 accumulation, and rescales.  This is
standard w8a8 dynamic quantization — typical logit error for ViT-class
trunks is well under bf16-vs-fp32 noise at the argmax level; the parity
budget is measured by tests/test_int8.py (cosine/agreement vs the f32
dense) and reported in the bench detail.

Enable per-module via ``quant=True`` or globally with IR_ADS_INT8=1 (read
at trace time).  Training still uses the float path (straight-through
training is out of scope; the headline bench is eval).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def int8_enabled() -> bool:
    return os.environ.get("IR_ADS_INT8", "") not in ("", "0", "false")


def quantized_matmul(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """w8a8 dynamic-quantized x @ kernel with f32 output.

    x: (..., K); kernel: (K, N) float.  Returns (..., N) f32."""
    s_w = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 127.0  # (1, N)
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(
        jnp.round(kernel / s_w), -127, 127
    ).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # (..., 1)
    s_x = jnp.maximum(s_x, 1e-12)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return out.astype(jnp.float32) * s_x * s_w


def quantized_conv(
    x: jax.Array, kernel: jax.Array, padding
) -> jax.Array:
    """w8a8 dynamic-quantized NHWC conv with f32 output.

    x: (B, H, W, Cin); kernel: (kh, kw, Cin, Cout) float.  Weights are
    per-output-channel symmetric int8.  Activations use a per-tensor scale:
    a per-pixel scale cannot factor out of a >1x1 conv's tap sum (each
    output pixel mixes receptive-field pixels with different scales), so the
    per-token trick from :func:`quantized_matmul` is only exact for 1x1 —
    callers route 1x1 kernels through the matmul path instead."""
    s_w = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0  # (Cout,)
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0  # scalar
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    out = jax.lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return out.astype(jnp.float32) * s_x * s_w


class QuantConv(nn.Module):
    """Drop-in for nn.Conv (stride 1) with an int8 eval path.

    Same param tree as nn.Conv (kernel (kh, kw, Cin, Cout), bias).  1x1
    kernels run the exact per-token :func:`quantized_matmul`; larger kernels
    use :func:`quantized_conv` (per-tensor activation scale).  Accepts the
    3-D (B, M, C) inputs flax Conv tolerates for 1x1 kernels."""

    features: int
    kernel_size: tuple = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    quant: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
        )
        use_int8 = self.quant if self.quant is not None else int8_enabled()
        out_dtype = self.dtype or x.dtype
        squeeze = x.ndim == 3
        if not use_int8:
            xin = x.astype(out_dtype)
            if squeeze:
                xin = xin[:, None]
            y = jax.lax.conv_general_dilated(
                xin,
                kernel.astype(out_dtype),
                window_strides=(1, 1),
                padding=(
                    [(self.padding, self.padding)] * 2
                    if isinstance(self.padding, int)
                    else self.padding
                ),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if squeeze:
                y = y[:, 0]
        elif kh == 1 and kw == 1:
            y = quantized_matmul(x, kernel.reshape(cin, self.features))
            y = y.astype(out_dtype)
        else:
            xin = x[:, None] if squeeze else x
            y = quantized_conv(xin, kernel.astype(jnp.float32), self.padding)
            y = y.astype(out_dtype)
            if squeeze:
                y = y[:, 0]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in nn.Dense with an int8 eval path.

    Same param tree as nn.Dense.  ``quant=None`` -> IR_ADS_INT8 env."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    quant: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features)
        )
        use_int8 = self.quant if self.quant is not None else int8_enabled()
        if use_int8:
            y = quantized_matmul(x, kernel.astype(jnp.float32))
            y = y.astype(self.dtype or x.dtype)
        else:
            y = jnp.dot(
                x, kernel.astype(self.dtype or kernel.dtype)
            )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y
