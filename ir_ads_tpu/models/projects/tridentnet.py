"""TridentNet: weight-shared multi-dilation conv branches.

Reference: detectron2/projects/TridentNet/tridentnet/trident_conv.py
(TridentConv :10-100: ONE weight tensor applied with per-branch dilation/
padding) and trident_backbone.py (TridentBottleneckBlock: the ResNet
bottleneck whose 3x3 conv is a TridentConv over num_branch parallel
streams; test-time single-branch via ``test_branch_idx``).

TPU-native notes: the branch loop is a static python loop over dilations —
XLA compiles one conv per dilation sharing the same HLO constant weight;
batching the branches into the batch dim keeps the MXU fed.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class TridentConv(nn.Module):
    """One (k, k, Cin, Cout) weight, ``num_branch`` dilated applications
    (trident_conv.py:10-100).  Input/output: a list of per-branch NHWC maps
    (length num_branch in training / multi-branch test, else 1)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilations: Sequence[int] = (1, 2, 3)
    test_branch_idx: int = -1
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, inputs: List[jax.Array], train: bool = False
    ) -> List[jax.Array]:
        num_branch = len(self.dilations) if train or self.test_branch_idx == -1 else 1
        assert len(inputs) == num_branch
        k = self.kernel_size
        in_ch = inputs[0].shape[-1]
        weight = self.param(
            "weight",
            nn.initializers.he_uniform(),
            (k, k, in_ch, self.out_channels),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )

        def apply(x, dilation):
            pad = dilation * (k - 1) // 2
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype or x.dtype),
                weight.astype(self.dtype or x.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                rhs_dilation=(dilation, dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        if train or self.test_branch_idx == -1:
            return [apply(x, d) for x, d in zip(inputs, self.dilations)]
        return [apply(inputs[0], self.dilations[self.test_branch_idx])]


class TridentBottleneck(nn.Module):
    """ResNet bottleneck whose 3x3 is a TridentConv
    (trident_backbone.py TridentBottleneckBlock): per-branch
    1x1 reduce -> shared-weight dilated 3x3 -> 1x1 expand, residual add.
    ``concat_output`` stacks branches into the batch dim (the reference's
    trick for feeding a single RPN over all branches)."""

    bottleneck_channels: int
    out_channels: int
    dilations: Sequence[int] = (1, 2, 3)
    test_branch_idx: int = -1
    concat_output: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if not isinstance(inputs, (list, tuple)):
            num_branch = (
                len(self.dilations)
                if train or self.test_branch_idx == -1
                else 1
            )
            inputs = [inputs] * num_branch

        def groups_for(ch):
            return 32 if ch % 32 == 0 else ch

        # all convs/norms are SHARED across branches (only dilation differs)
        conv1 = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")
        gn1 = nn.GroupNorm(num_groups=groups_for(self.bottleneck_channels),
                           dtype=self.dtype, name="gn1")
        conv2 = TridentConv(
            self.bottleneck_channels, 3, dilations=self.dilations,
            test_branch_idx=self.test_branch_idx, dtype=self.dtype,
            name="conv2",
        )
        gn2 = nn.GroupNorm(num_groups=groups_for(self.bottleneck_channels),
                           dtype=self.dtype, name="gn2")
        conv3 = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv3")
        gn3 = nn.GroupNorm(num_groups=groups_for(self.out_channels),
                           dtype=self.dtype, name="gn3")
        shortcut = (
            nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="shortcut")
            if inputs[0].shape[-1] != self.out_channels
            else None
        )

        mids = [nn.relu(gn1(conv1(x))) for x in inputs]
        mids = conv2(mids, train)
        outs = []
        for x, h in zip(inputs, mids):
            h = nn.relu(gn2(h))
            h = gn3(conv3(h))
            if shortcut is not None:
                x = shortcut(x)
            outs.append(nn.relu(x + h))
        if self.concat_output:
            return jnp.concatenate(outs, axis=0)
        return outs
