"""RegNet-X/Y backbone (reference detectron2/modeling/backbone/regnet.py).

Quantized-linear width schedule (AnyNet/RegNet recipe), X-blocks (group
conv bottleneck) with optional SE (Y variant).  NHWC flax, frozen-BN option
like the other detection trunks.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ir_ads_tpu.models.backbones.resnet import BNorm

Dtype = Any


def regnet_widths(
    w_0: int, w_a: float, w_m: float, depth: int, q: int = 8
) -> Tuple[List[int], List[int]]:
    """Per-stage (widths, depths) from the RegNet parameterization."""
    ks = np.round(
        np.log((w_0 + w_a * np.arange(depth)) / w_0) / np.log(w_m)
    )
    widths = w_0 * np.power(w_m, ks)
    widths = (np.round(widths / q) * q).astype(int)
    stage_widths, stage_depths = [], []
    for w in widths:
        if not stage_widths or stage_widths[-1] != w:
            stage_widths.append(int(w))
            stage_depths.append(1)
        else:
            stage_depths[-1] += 1
    return stage_widths, stage_depths


def adjust_widths_groups(
    widths: Sequence[int], group_width: int
) -> Tuple[List[int], List[int]]:
    """Make widths divisible by their (possibly reduced) group widths
    (d2 regnet adjust_ws_gs_comp)."""
    gs = [min(group_width, w) for w in widths]
    ws = [int(round(w / g) * g) for w, g in zip(widths, gs)]
    return ws, gs


class XBlock(nn.Module):
    width: int
    stride: int
    group_width: int
    se_ratio: float = 0.0
    frozen_bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        groups = max(self.width // self.group_width, 1)
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="a")(x)
        h = BNorm(self.frozen_bn, dtype=self.dtype, name="a_bn")(h, train)
        h = nn.relu(h)
        h = nn.Conv(self.width, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=groups, use_bias=False,
                    dtype=self.dtype, name="b")(h)
        h = BNorm(self.frozen_bn, dtype=self.dtype, name="b_bn")(h, train)
        h = nn.relu(h)
        if self.se_ratio > 0:
            se_w = max(int(x.shape[-1] * self.se_ratio), 1)
            s = h.mean((1, 2), keepdims=True)
            s = nn.relu(nn.Conv(se_w, (1, 1), dtype=self.dtype,
                                name="se_fc1")(s))
            s = jax.nn.sigmoid(nn.Conv(self.width, (1, 1), dtype=self.dtype,
                                       name="se_fc2")(s))
            h = h * s
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="c")(h)
        h = BNorm(self.frozen_bn, dtype=self.dtype, name="c_bn")(h, train)
        if self.stride != 1 or x.shape[-1] != self.width:
            identity = nn.Conv(self.width, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="proj")(x)
            identity = BNorm(self.frozen_bn, dtype=self.dtype,
                             name="proj_bn")(identity, train)
        return nn.relu(h + identity)


REGNET_PARAMS = {
    # name: (w_0, w_a, w_m, depth, group_width, se_ratio)
    "regnetx_400mf": (24, 24.48, 2.54, 22, 16, 0.0),
    "regnetx_1.6gf": (80, 34.01, 2.25, 18, 24, 0.0),
    "regnetx_4gf": (96, 38.65, 2.43, 23, 40, 0.0),
    "regnety_400mf": (48, 27.89, 2.09, 16, 8, 0.25),
    "regnety_4gf": (96, 31.41, 2.24, 22, 64, 0.25),
}


class RegNet(nn.Module):
    variant: str = "regnetx_400mf"
    frozen_bn: bool = True
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        w0, wa, wm, d, gw, se = REGNET_PARAMS[self.variant]
        widths, depths = regnet_widths(w0, wa, wm, d)
        assert len(widths) == 4, (widths, depths)
        widths, gws = adjust_widths_groups(widths, gw)

        x = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = BNorm(self.frozen_bn, dtype=self.dtype, name="stem_bn")(x, train)
        x = nn.relu(x)

        outs = {}
        for i, (w, n_blocks) in enumerate(zip(widths, depths)):
            for j in range(n_blocks):
                x = XBlock(w, 2 if j == 0 else 1, gws[i], se,
                           self.frozen_bn, dtype=self.dtype,
                           name=f"s{i + 1}_b{j}")(x, train)
            name = f"res{i + 2}"
            if name in self.out_features:
                outs[name] = x
        return outs
