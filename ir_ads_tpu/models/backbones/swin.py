"""Dual-stream Swin Transformer backbone with MAPA / MPG / DSCF — the IR-ADS
flagship model, rebuilt TPU-native.

Capability parity with the reference implementation at
semseg/models/backbones/swin.py (citations inline), re-designed for XLA:

  * NHWC layout throughout; tokens stay on a (B, H, W, C) grid — no repeated
    (B, L, C) flatten/unflatten bookkeeping.
  * The SW-MSA shift mask and the relative-position index are compile-time
    constants (shapes are static under jit) instead of per-step device code.
  * Window attention is a batch of (N, N) matmuls on the MXU; a fused Pallas
    kernel is available via ``attn_impl='pallas'``
    (ir_ads_tpu/ops/pallas_swin.py) and must match the XLA path.
  * Deformable cross-modal fusion (DSCF / DAttentionMM) uses the shared
    ``grid_sample`` primitive (ir_ads_tpu/ops/grid_sample.py) — XLA gathers,
    differentiable, fused under jit.
  * Randomness (MMST modality masking, dropout, drop-path) is explicit via
    flax RNG collections rather than global python/torch RNG
    (reference swin.py:1093-1105 uses `random.sample` mid-forward).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ir_ads_tpu.ops.grid_sample import grid_sample_matmul, make_ref_grid
from ir_ads_tpu.utils.ablate import ablated
from ir_ads_tpu.ops.layers import (
    DropPath,
    Mlp,
    PatchEmbed,
    PatchMerging,
    kaiming_uniform_init,
    trunc_normal_init,
)
from ir_ads_tpu.ops.pallas_swin import (
    fused_window_attention_map,
    fused_window_attention_qkv,
    shift_region_ids,
)
from ir_ads_tpu.ops.window_attention import (
    gather_rel_pos_bias,
    shift_window_mask,
    window_attention,
    window_partition,
    window_reverse,
)

Dtype = Any


class WindowMSA(nn.Module):
    """W-MSA with relative position bias (reference swin.py:23-125)."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attn_impl: str = "xla"  # "xla" | "pallas" (fused kernel, TPU only)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B*nW, N, C) — or (B, Hp, Wp, C) for "pallas_map"
        mask: Optional[jax.Array],  # (nW, N, N) or None (xla impl)
        deterministic: bool = True,
        region: Optional[jax.Array] = None,  # (nW, N) int32 (pallas impls)
    ) -> jax.Array:
        ws = self.window_size
        c = x.shape[-1]
        head_dim = c // self.num_heads
        scale = head_dim**-0.5

        table = self.param(
            "rel_pos_bias_table",
            trunc_normal_init(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        from ir_ads_tpu.ops.int8 import QuantDense, int8_enabled

        dense_cls = QuantDense if int8_enabled() else nn.Dense
        qkv = dense_cls(
            3 * c,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(),
            name="qkv",
        )(x)
        bias = gather_rel_pos_bias(table, ws, ws)  # (heads, N, N)
        if self.attn_impl == "pallas_map":
            # v3 fused kernel: consumes the qkv MAP; window partition /
            # reverse happen as VMEM-local relayouts inside the kernel, so
            # the XLA layout passes around the attention disappear
            out = fused_window_attention_map(
                qkv, bias, region, scale, self.num_heads, ws
            )
        elif self.attn_impl == "pallas":
            bn, n, _ = x.shape
            # v2 fused kernel: heads stay in the lane dim, the qkv tensor is
            # consumed exactly as the projection produced it (no transposes,
            # no D/N padding), attention matrices never touch HBM
            if region is None:
                region = jnp.zeros((1, n), jnp.int32)
            out = fused_window_attention_qkv(
                qkv, bias, region, scale, self.num_heads
            )
        else:
            bn, n, _ = x.shape
            qkv = qkv.reshape(bn, n, 3, self.num_heads, head_dim)
            q, k, v = (
                qkv[:, :, 0].transpose(0, 2, 1, 3),
                qkv[:, :, 1].transpose(0, 2, 1, 3),
                qkv[:, :, 2].transpose(0, 2, 1, 3),
            )
            out = window_attention(q, k, v, bias, mask, scale)
            out = out.transpose(0, 2, 1, 3).reshape(bn, n, c)
        out = dense_cls(
            c, dtype=self.dtype, kernel_init=trunc_normal_init(), name="proj"
        )(out)
        if self.proj_drop > 0.0 and not deterministic:
            out = nn.Dropout(self.proj_drop)(out, deterministic=False)
        return out


class ShiftWindowMSA(nn.Module):
    """Pad → (cyclic shift) → window partition → W-MSA → reverse
    (reference swin.py:128-254)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int = 0
    drop_path_rate: float = 0.0
    proj_drop: float = 0.0
    attn_impl: str = "auto"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        drop_path_override: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift_size

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        # "auto" = v2 fused Pallas kernel on TPU (1.4-5x per attention call
        # at bench shapes), plain XLA elsewhere (CPU tests / dryrun).
        # "pallas_map" (v3: partition/reverse folded into the kernel as
        # VMEM relayouts) is numerically verified but its big-grid 5D
        # relayout sends the Mosaic compiler into multi-minute compiles at
        # stage-0 480p shapes — opt-in via IR_ADS_SWIN_ATTN until fixed.
        attn_impl = self.attn_impl
        if attn_impl == "auto":
            import os

            attn_impl = os.environ.get("IR_ADS_SWIN_ATTN", "") or (
                "pallas" if jax.default_backend() == "tpu" else "xla"
            )

        mask = region = None
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            # embed only the (nW, N) int32 region ids as a program constant
            # and expand the dense (nW, N, N) mask on device — the dense
            # version baked ~10MB of constants into the HLO at 480p
            region = jnp.asarray(shift_region_ids(hp, wp, ws, shift))
            if attn_impl == "xla":
                neq = region[:, :, None] != region[:, None, :]
                mask = jnp.where(neq, -100.0, 0.0).astype(jnp.float32)
                region = None

        msa = WindowMSA(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=ws,
            proj_drop=self.proj_drop,
            attn_impl=attn_impl,
            dtype=self.dtype,
            name="w_msa",
        )
        if attn_impl == "pallas_map":
            # map path: no window_partition/reverse in XLA at all
            x = msa(x, mask, deterministic, region)
        else:
            wins = window_partition(x, ws)  # (B*nW, N, C)
            wins = msa(wins, mask, deterministic, region)
            x = window_reverse(wins, ws, hp, wp)

        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w, :]
        if drop_path_override is not None:
            if deterministic:
                return x
            from ir_ads_tpu.ops.layers import drop_path

            return drop_path(x, drop_path_override, False, self.make_rng("dropout"))
        return DropPath(self.drop_path_rate)(x, deterministic=deterministic)


class Adapter(nn.Module):
    """Parameter-efficient adapter MLP (reference swin.py:472-502).

    Init matches the reference's ctor + train_mm.py:59-81 weight surgery:
    D_fc1 kaiming-uniform(a=sqrt5), D_fc2 zeros, biases zeros — so a freshly
    initialized adapter is an identity (skip) or zero (no-skip) map.
    """

    mlp_ratio: float = 0.0625
    skip_connect: bool = True
    drop: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        d = x.shape[-1]
        hidden = int(d * self.mlp_ratio)
        xs = nn.Dense(
            hidden,
            kernel_init=kaiming_uniform_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="D_fc1",
        )(x)
        xs = nn.relu(xs)
        if self.drop > 0.0 and not deterministic:
            xs = nn.Dropout(self.drop)(xs, deterministic=False)
        xs = nn.Dense(
            d,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="D_fc2",
        )(xs)
        return x + xs if self.skip_connect else xs


class _DenseParams(nn.Module):
    """Parameter container matching nn.Dense's tree ({kernel, bias})."""

    in_features: int
    features: int
    kernel_init: Any

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _LNParams(nn.Module):
    """Parameter container matching nn.LayerNorm's tree ({scale, bias})."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return s, b


class _MlpParams(nn.Module):
    """Parameter container matching Mlp's tree (Dense_0 / Dense_1)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(
            self.dim, self.hidden, trunc_normal_init(), name="Dense_0"
        )()
        w2, b2 = _DenseParams(
            self.hidden, self.dim, trunc_normal_init(), name="Dense_1"
        )()
        return w1, b1, w2, b2


class _AdapterParams(nn.Module):
    """Parameter container matching Adapter's tree (D_fc1 / D_fc2)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(
            self.dim, self.hidden, kaiming_uniform_init(), name="D_fc1"
        )()
        w2, b2 = _DenseParams(
            self.hidden, self.dim, nn.initializers.zeros, name="D_fc2"
        )()
        return w1, b1, w2, b2


class _WindowMSAParams(nn.Module):
    """Parameter container matching WindowMSA's tree
    (rel_pos_bias_table / qkv / proj)."""

    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self):
        ws = self.window_size
        table = self.param(
            "rel_pos_bias_table",
            trunc_normal_init(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        wq, bq = _DenseParams(
            self.dim, 3 * self.dim, trunc_normal_init(), name="qkv"
        )()
        wpj, bpj = _DenseParams(
            self.dim, self.dim, trunc_normal_init(), name="proj"
        )()
        return table, wq, bq, wpj, bpj


class _ShiftWindowMSAParams(nn.Module):
    """Parameter container matching ShiftWindowMSA's tree (w_msa/...)."""

    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self):
        return _WindowMSAParams(
            self.dim, self.num_heads, self.window_size, name="w_msa"
        )()


def _ffn_impl() -> str:
    """Block-tail implementation: fused Pallas kernel on TPU eval, XLA
    otherwise.  Override with IR_ADS_FFN=fused|xla.  Under IR_ADS_INT8 the
    fused kernel runs its w8a8 variant (ops/pallas_mlp._tail_kernel_int8)."""
    import os

    ov = os.environ.get("IR_ADS_FFN", "")
    if ov:
        return ov
    return "fused" if jax.default_backend() == "tpu" else "xla"


class SwinBlockAdapter(nn.Module):
    """Swin block with per-modality MAPA adapters (reference swin.py:505-610).

    The attention/FFN weights are shared between the RGB and DTE streams;
    only the adapter branch differs per ``sub_mode``.
    """

    dim: int
    num_heads: int
    ffn_dim: int
    window_size: int
    shift: bool = False
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    adapter_ratio: float = 0.0625
    adapter_drop: float = 0.1  # reference Adapter dropout (swin.py:472-502)
    attn_impl: str = "auto"
    stage_idx: int = 0  # explicit stage index (per-stage env list keying)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        sub_mode: str,
        deterministic: bool = True,
        drop_path_override: Optional[jax.Array] = None,
        bias_override: Optional[jax.Array] = None,
    ) -> jax.Array:
        # ``bias_override``: dense (heads, N, N) rel-pos bias precomputed by
        # SwinStage OUTSIDE the deep-stage scan (one batched gather over the
        # stacked tables instead of a [529,heads]->[N*N,heads] gather + f32
        # [N,N,heads] layout copies PER scan iteration — the round-2 profile
        # charged ~2.3 ms/forward of stage-2 scan glue to those).  Gradients
        # flow through it to the table; the table param is still declared
        # below so the tree is unchanged.
        attn_impl = self.attn_impl
        if attn_impl == "auto":
            import os

            # auto on TPU = the measured-best per-stage config (bench r5:
            # banded v4 half-block kernels at the big-map stages 0-1 —
            # whole-map kernels there blow up the remote-compile payload —
            # and whole-block v6 kernels at 2-3)
            attn_impl = os.environ.get("IR_ADS_SWIN_ATTN", "") or (
                "pallas4,pallas4,pallas6,pallas6"
                if jax.default_backend() == "tpu"
                else "xla"
            )
            if "," in attn_impl:
                # per-stage list keyed by the explicit stage index (plumbed
                # from SwinTransformer)
                parts = [p.strip() for p in attn_impl.split(",")]
                idx = max(0, min(self.stage_idx, len(parts) - 1))
                attn_impl = parts[idx]
        # per-stage kernel-layout env lists (IR_ADS_SWIN_PACKED="2,2,1,1")
        # resolve against this trace-time stage context
        from ir_ads_tpu.ops import pallas_swin as _psw

        _psw.set_stage_idx(self.stage_idx)
        dp_branch = None  # set when a fused half-block needs drop-path
        if (
            attn_impl in ("pallas4", "pallas5", "pallas6", "pallas7")
            and not deterministic
        ):
            # v6 fuses BOTH residuals + the adapter's internal dropout —
            # module path only in train.  The HALF-block kernels (v4/v5)
            # have exactly one residual: y = x + branch, so train-mode
            # drop-path is exact by reconstruction,
            #   x_out = x + drop_path(y - x),
            # provided no dropout lives inside the fused half
            # (proj_drop == drop_rate; the IR-ADS recipe sets it to 0).
            if self.drop_rate == 0.0:
                attn_impl = "pallas4"
                dp_branch = True
            else:
                attn_impl = (
                    "pallas" if jax.default_backend() == "tpu" else "xla"
                )

        if attn_impl == "pallas6":
            # v6: the ENTIRE block (attention half + tail) as one kernel —
            # one HBM read of the real x map, one write of the block output.
            from ir_ads_tpu.ops.pallas_swin import fused_window_block_v6

            b_, h_, w_, cc = x.shape
            ws = self.window_size
            shift = ws // 2 if self.shift else 0
            s1, b1 = _LNParams(cc, name="norm1")()
            table, wq, bq, wpj, bpj = _ShiftWindowMSAParams(
                cc, self.num_heads, ws, name="attn"
            )()
            scale = (cc // self.num_heads) ** -0.5
            bias = (
                bias_override if bias_override is not None
                else gather_rel_pos_bias(table, ws, ws)
            )
            hp = -(-h_ // ws) * ws
            wp = -(-w_ // ws) * ws
            region = None
            if shift > 0:
                region = jnp.asarray(shift_region_ids(hp, wp, ws, shift))
            attn_params = (s1, b1, wq, bq, wpj, bpj, bias)
            ahid = int(cc * self.adapter_ratio)
            s_ln, b_ln = _LNParams(cc, name="norm2")()
            w1, bb1, w2, bb2 = _MlpParams(cc, self.ffn_dim, name="ffn")()
            if sub_mode == "dual":
                # ONE kernel over the dual batch: the per-modality adapter
                # weights are stacked on a leading stream dim and selected
                # per grid step by the BlockSpec index map (first half of
                # the batch rgb, second dte) — no split/concat glue, twice
                # the grid for pipelining
                pr = _AdapterParams(cc, ahid, name="adapter_rgb")()
                pd = _AdapterParams(cc, ahid, name="adapter_dte")()
                stacked = tuple(
                    jnp.stack([a, d]) for a, d in zip(pr, pd)
                )
                return fused_window_block_v6(
                    x, attn_params,
                    (s_ln, b_ln, w1, bb1, w2, bb2, *stacked),
                    region, scale, self.num_heads, ws, shift,
                )
            pa = _AdapterParams(cc, ahid, name=f"adapter_{sub_mode}")()
            return fused_window_block_v6(
                x, attn_params, (s_ln, b_ln, w1, bb1, w2, bb2, *pa),
                region, scale, self.num_heads, ws, shift,
            )

        if attn_impl == "pallas5":
            # v5 whole-map fused half-block (ops/pallas_swin.py): pad,
            # cyclic roll, crop and both projections all live inside the
            # kernel — the attention half is exactly 2 HBM passes (read the
            # real x map, write the real y map), no XLA glue at all.
            from ir_ads_tpu.ops.pallas_swin import fused_window_block_full

            b_, h_, w_, cc = x.shape
            ws = self.window_size
            shift = ws // 2 if self.shift else 0
            s1, b1 = _LNParams(cc, name="norm1")()
            table, wq, bq, wpj, bpj = _ShiftWindowMSAParams(
                cc, self.num_heads, ws, name="attn"
            )()
            scale = (cc // self.num_heads) ** -0.5
            bias = (
                bias_override if bias_override is not None
                else gather_rel_pos_bias(table, ws, ws)
            )
            hp = -(-h_ // ws) * ws
            wp = -(-w_ // ws) * ws
            region = None
            if shift > 0:
                region = jnp.asarray(shift_region_ids(hp, wp, ws, shift))
            x = fused_window_block_full(
                x, s1, b1, wq, bq, wpj, bpj, bias, region,
                scale, self.num_heads, ws, shift,
            )
        elif attn_impl == "pallas7":
            # v7 banded FULL block: the v4 attention half AND the block
            # tail in one kernel — for the big-map stages where v6's
            # whole-map scores don't fit VMEM.  Pad/roll stay in XLA (the
            # tail is per-token, so running it in rolled coordinates before
            # the un-roll/crop is exact at every real position).
            from ir_ads_tpu.ops.pallas_swin import fused_window_block_v7

            b_, h_, w_, cc = x.shape
            ws = self.window_size
            shift = ws // 2 if self.shift else 0
            s1, b1 = _LNParams(cc, name="norm1")()
            table, wq, bq, wpj, bpj = _ShiftWindowMSAParams(
                cc, self.num_heads, ws, name="attn"
            )()
            scale = (cc // self.num_heads) ** -0.5
            bias = (
                bias_override if bias_override is not None
                else gather_rel_pos_bias(table, ws, ws)
            )
            pad_b = (ws - h_ % ws) % ws
            pad_r = (ws - w_ % ws) % ws
            xm = x
            if pad_b or pad_r:
                xm = jnp.pad(xm, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            hp, wp = h_ + pad_b, w_ + pad_r
            region = None
            if shift > 0:
                xm = jnp.roll(xm, shift=(-shift, -shift), axis=(1, 2))
                region = jnp.asarray(shift_region_ids(hp, wp, ws, shift))
            attn_params = (s1, b1, wq, bq, wpj, bpj, bias)
            ahid = int(cc * self.adapter_ratio)
            s_ln, b_ln = _LNParams(cc, name="norm2")()
            w1, bb1, w2, bb2 = _MlpParams(cc, self.ffn_dim, name="ffn")()
            if sub_mode == "dual":
                pr = _AdapterParams(cc, ahid, name="adapter_rgb")()
                pd = _AdapterParams(cc, ahid, name="adapter_dte")()
                tail_params = (
                    s_ln, b_ln, w1, bb1, w2, bb2,
                    *(jnp.stack([a, d]) for a, d in zip(pr, pd)),
                )
            else:
                pa = _AdapterParams(cc, ahid, name=f"adapter_{sub_mode}")()
                tail_params = (s_ln, b_ln, w1, bb1, w2, bb2, *pa)
            y = fused_window_block_v7(
                xm, attn_params, tail_params, region,
                scale, self.num_heads, ws, h_, w_, shift,
            )
            if shift > 0:
                y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
            if pad_b or pad_r:
                y = y[:, :h_, :w_, :]
            return y
        elif attn_impl == "pallas4":
            # v4 fused attention half-block (ops/pallas_swin.py): one HBM
            # read of x, one write of y = x + proj(attn(qkv(LN1(x)))) —
            # LN1, qkv, the window partition/reverse, attention and the
            # out projection never touch HBM.  Parameter containers keep
            # the tree identical to the module path.  Pad/roll stay in
            # XLA; the kernel zeroes padded positions after LN1 so padded
            # keys match the module path (LN-before-pad) exactly.
            from ir_ads_tpu.ops.pallas_swin import fused_window_block

            b_, h_, w_, cc = x.shape
            ws = self.window_size
            shift = ws // 2 if self.shift else 0
            s1, b1 = _LNParams(cc, name="norm1")()
            table, wq, bq, wpj, bpj = _ShiftWindowMSAParams(
                cc, self.num_heads, ws, name="attn"
            )()
            scale = (cc // self.num_heads) ** -0.5
            bias = (
                bias_override if bias_override is not None
                else gather_rel_pos_bias(table, ws, ws)
            )
            pad_b = (ws - h_ % ws) % ws
            pad_r = (ws - w_ % ws) % ws
            xm = x
            if pad_b or pad_r:
                xm = jnp.pad(xm, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            hp, wp = h_ + pad_b, w_ + pad_r
            region = None
            if shift > 0:
                xm = jnp.roll(xm, shift=(-shift, -shift), axis=(1, 2))
                region = jnp.asarray(shift_region_ids(hp, wp, ws, shift))
            y = fused_window_block(
                xm, s1, b1, wq, bq, wpj, bpj, bias, region,
                scale, self.num_heads, ws, h_, w_, shift,
            )
            if shift > 0:
                y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
            if pad_b or pad_r:
                y = y[:, :h_, :w_, :]
            if dp_branch is not None:
                # train: y = x + branch (kernel-fused residual).  Recover
                # the branch and apply drop-path exactly as the module
                # path's ShiftWindowMSA tail does.
                branch = y - x
                if drop_path_override is not None:
                    from ir_ads_tpu.ops.layers import drop_path

                    branch = drop_path(
                        branch, drop_path_override, False,
                        self.make_rng("dropout"),
                    )
                else:
                    branch = DropPath(self.drop_path_rate)(
                        branch, deterministic=deterministic
                    )
                x = x + branch
            else:
                x = y
        else:
            identity = x
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
            h = ShiftWindowMSA(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=self.window_size // 2 if self.shift else 0,
                drop_path_rate=self.drop_path_rate,
                proj_drop=self.drop_rate,
                attn_impl=attn_impl,
                dtype=self.dtype,
                name="attn",
            )(h, deterministic, drop_path_override)
            x = h + identity

        if ablated("tail"):  # perf-attribution stub (x keeps its deps)
            return x
        # Block tail: out = x + FFN(LN(x)) + 0.5*Adapter(x).  On TPU eval
        # the fused kernel (ops/pallas_mlp.py) runs it in one HBM
        # read + one write (the FFN hidden / LN / adapter branch never
        # leave VMEM) — the XLA path moves ~19 map passes.  The parameter
        # containers produce a tree byte-identical to the module path, so
        # checkpoints and the torch importer are unaffected.
        if deterministic and _ffn_impl() == "fused":
            from ir_ads_tpu.ops.pallas_mlp import fused_block_tail

            b_, hh, ww, cc = x.shape
            ahid = int(cc * self.adapter_ratio)
            s_ln, b_ln = _LNParams(cc, name="norm2")()
            w1, b1, w2, b2 = _MlpParams(cc, self.ffn_dim, name="ffn")()
            x2 = x.reshape(-1, cc)
            if sub_mode == "dual":
                half_n = (b_ // 2) * hh * ww
                pr = _AdapterParams(cc, ahid, name="adapter_rgb")()
                pd = _AdapterParams(cc, ahid, name="adapter_dte")()
                out = jnp.concatenate(
                    [
                        fused_block_tail(
                            x2[:half_n], s_ln, b_ln, w1, b1, w2, b2, *pr
                        ),
                        fused_block_tail(
                            x2[half_n:], s_ln, b_ln, w1, b1, w2, b2, *pd
                        ),
                    ],
                    axis=0,
                )
            else:
                pa = _AdapterParams(cc, ahid, name=f"adapter_{sub_mode}")()
                out = fused_block_tail(x2, s_ln, b_ln, w1, b1, w2, b2, *pa)
            return out.reshape(b_, hh, ww, cc)

        if sub_mode == "dual":
            # both streams batched through the shared attention/FFN; only
            # the adapter branch is per-modality (first half rgb, second dte)
            half = x.shape[0] // 2
            a_rgb = Adapter(
                mlp_ratio=self.adapter_ratio, skip_connect=False,
                drop=self.adapter_drop, dtype=self.dtype, name="adapter_rgb",
            )(x[:half], deterministic)
            a_dte = Adapter(
                mlp_ratio=self.adapter_ratio, skip_connect=False,
                drop=self.adapter_drop, dtype=self.dtype, name="adapter_dte",
            )(x[half:], deterministic)
            adapter_x = 0.5 * jnp.concatenate([a_rgb, a_dte], axis=0)
        else:
            adapter = Adapter(
                mlp_ratio=self.adapter_ratio,
                skip_connect=False,
                drop=self.adapter_drop,
                dtype=self.dtype,
                name=f"adapter_{sub_mode}",
            )
            adapter_x = 0.5 * adapter(x, deterministic)  # scale (swin.py:577)

        import os as _os

        if (
            not deterministic
            and _os.environ.get("IR_ADS_TAIL_REMAT", "1") not in ("", "0")
        ):
            # round-5: recompute the FFN hidden in the backward instead of
            # saving (tokens, 4C) per block — under the stage-2 scan the
            # saved hiddens stack into (L, B, H, W, 4C) dynamic-update-slice
            # writes (~6.6 ms of the r5b bs4 train profile) and ~340 MB of
            # HBM.  Function-form remat keeps norm2/ffn at their existing
            # param paths, so checkpoints are unchanged; the recompute is
            # one LN + two matmuls per block backward.
            def _tail_fn(mdl, xx, det, dpo):
                hh = nn.LayerNorm(
                    epsilon=1e-5, dtype=mdl.dtype, name="norm2"
                )(xx)
                return Mlp(
                    hidden_dim=mdl.ffn_dim,
                    drop_rate=mdl.drop_rate,
                    drop_path_rate=mdl.drop_path_rate,
                    add_identity=True,
                    dtype=mdl.dtype,
                    name="ffn",
                )(hh, identity=xx, deterministic=det,
                  drop_path_override=dpo)

            h = nn.remat(_tail_fn, static_argnums=(2,))(
                self, x, deterministic, drop_path_override
            )
            return h + adapter_x

        identity = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = Mlp(
            hidden_dim=self.ffn_dim,
            drop_rate=self.drop_rate,
            drop_path_rate=self.drop_path_rate,
            add_identity=True,
            dtype=self.dtype,
            name="ffn",
        )(h, identity=identity, deterministic=deterministic,
          drop_path_override=drop_path_override)
        return h + adapter_x


class SwinBlockPair(nn.Module):
    """One W-MSA block followed by one SW-MSA block — the scan unit for deep
    stages.  Per-block drop-path rates arrive as a traced (2,) vector so all
    pairs share one compiled body."""

    dim: int
    num_heads: int
    ffn_dim: int
    window_size: int
    drop_rate: float = 0.0
    adapter_ratio: float = 0.0625
    adapter_drop: float = 0.1
    attn_impl: str = "auto"
    stage_idx: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        sub_mode: str,
        deterministic: bool,
        rates: jax.Array,  # (2,) per-block drop-path rates
        bias_pair: Optional[jax.Array] = None,  # (2, heads, N, N) dense bias
    ) -> jax.Array:
        common = dict(
            dim=self.dim,
            num_heads=self.num_heads,
            ffn_dim=self.ffn_dim,
            window_size=self.window_size,
            drop_rate=self.drop_rate,
            adapter_ratio=self.adapter_ratio,
            adapter_drop=self.adapter_drop,
            attn_impl=self.attn_impl,
            stage_idx=self.stage_idx,
            dtype=self.dtype,
        )
        b0 = bias_pair[0] if bias_pair is not None else None
        b1 = bias_pair[1] if bias_pair is not None else None
        x = SwinBlockAdapter(shift=False, name="block0", **common)(
            x, sub_mode, deterministic, rates[0], b0
        )
        x = SwinBlockAdapter(shift=True, name="block1", **common)(
            x, sub_mode, deterministic, rates[1], b1
        )
        return x, None  # (carry, per-step output) for nn.scan


class SwinStage(nn.Module):
    """One Swin stage: blocks + optional patch-merging downsample
    (reference SwinBlockSequence, swin.py:613-697).

    Deep stages (depth >= 4, even) run as an nn.scan over block PAIRS with
    stacked parameters: the compiled program contains ONE pair body instead
    of ``depth`` inlined blocks — ~9x smaller HLO for Swin-B's 18-block
    stage, which matters both for compile time and for compile-service
    payload limits on remote-compiled TPU backends."""

    dim: int
    depth: int
    num_heads: int
    ffn_dim: int
    window_size: int
    drop_rate: float
    drop_path_rates: Sequence[float]
    downsample: bool
    adapter_ratio: float = 0.0625
    adapter_drop: float = 0.1
    use_remat: bool = False
    attn_impl: str = "auto"
    stage_idx: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, sub_mode: str, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        if ablated(f"blocks{self.dim}"):  # perf-attribution stub (key by dim)
            out = x
            if self.downsample:
                x = PatchMerging(
                    out_dim=2 * self.dim, dtype=self.dtype, name="downsample"
                )(x)
            return x, out
        use_scan = self.depth >= 4 and self.depth % 2 == 0
        if use_scan:
            pair_cls = SwinBlockPair
            if self.use_remat:
                pair_cls = nn.remat(SwinBlockPair, static_argnums=(2, 3))
            # IR_ADS_SWIN_UNROLL (int or per-stage comma list): lax.scan
            # unroll factor.  Full unroll turns the per-iteration stacked-
            # param dynamic slices and rel-pos-bias gathers into static
            # slices XLA can hoist/overlap (the round-2 profile charged
            # ~2.3 ms of the stage-2 scan to that glue); the param tree is
            # unchanged, only the loop structure.  Costs HLO size — the
            # persistent compile cache absorbs it after the first build.
            import os

            unroll_env = os.environ.get("IR_ADS_SWIN_UNROLL", "")
            if "," in unroll_env:
                parts = unroll_env.split(",")
                unroll_env = parts[
                    min(self.stage_idx, len(parts) - 1)
                ].strip()
            unroll = min(int(unroll_env or 1), self.depth // 2)
            # Hoist the rel-pos-bias gathers OUT of the scan: one batched
            # gather over the stacked (L, 529, heads) tables (read via
            # self.variables — same traced arrays, so the table still gets
            # gradients), fed to the pairs as a scanned-over xs input.  The
            # per-iteration [529,heads]->[N*N,heads] gathers + f32 layout
            # copies leave the while loop; each iteration now DMAs one
            # (2, heads, N, N) f32 slice instead (VERDICT r2 item 1).
            dense_bias = None
            if os.environ.get("IR_ADS_SWIN_HOIST_BIAS", "1") not in (
                "", "0",
            ) and not self.is_initializing():
                try:
                    pr = self.variables["params"]["pairs"]
                    ws = self.window_size
                    gb = lambda t: gather_rel_pos_bias(t, ws, ws)  # noqa
                    dense_bias = jnp.stack(
                        [
                            jax.vmap(gb)(
                                pr[b]["attn"]["w_msa"]["rel_pos_bias_table"]
                            )
                            for b in ("block0", "block1")
                        ],
                        axis=1,
                    )  # (L, 2, heads, N, N) f32
                except (KeyError, TypeError):
                    dense_bias = None  # ablation stubs / foreign trees
            scanned = nn.scan(
                pair_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(
                    (nn.broadcast, nn.broadcast, 0, 0)
                    if dense_bias is not None
                    else (nn.broadcast, nn.broadcast, 0)
                ),
                length=self.depth // 2,
                unroll=max(unroll, 1),
            )
            rates = jnp.asarray(self.drop_path_rates, jnp.float32).reshape(
                self.depth // 2, 2
            )
            extra = (dense_bias,) if dense_bias is not None else ()
            x, _ = scanned(
                dim=self.dim,
                num_heads=self.num_heads,
                ffn_dim=self.ffn_dim,
                window_size=self.window_size,
                drop_rate=self.drop_rate,
                adapter_ratio=self.adapter_ratio,
                adapter_drop=self.adapter_drop,
                attn_impl=self.attn_impl,
                stage_idx=self.stage_idx,
                dtype=self.dtype,
                name="pairs",
            )(x, sub_mode, deterministic, rates, *extra)
        else:
            block_cls = SwinBlockAdapter
            if self.use_remat:
                block_cls = nn.remat(SwinBlockAdapter, static_argnums=(2, 3))
            for i in range(self.depth):
                x = block_cls(
                    dim=self.dim,
                    num_heads=self.num_heads,
                    ffn_dim=self.ffn_dim,
                    window_size=self.window_size,
                    shift=i % 2 == 1,
                    drop_rate=self.drop_rate,
                    drop_path_rate=float(self.drop_path_rates[i]),
                    adapter_ratio=self.adapter_ratio,
                    adapter_drop=self.adapter_drop,
                    attn_impl=self.attn_impl,
                    stage_idx=self.stage_idx,
                    dtype=self.dtype,
                    name=f"blocks_{i}",
                )(x, sub_mode, deterministic)
        out = x
        if self.downsample:
            x = PatchMerging(
                out_dim=2 * self.dim, dtype=self.dtype, name="downsample"
            )(x)
        return x, out


class MPGBlock(nn.Module):
    """MAPA cross-modal prompt generation (reference swin.py:1045-1068).

    Down-projects both modalities, fuses, up-projects, then modulates with
    per-modality learned affine (TFTS) to produce modality prompts.
    """

    ratio: float = 0.125
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x_rgb: jax.Array, x_dte: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        dim = x_rgb.shape[-1]
        hidden = int(dim * self.ratio)
        kaiming = kaiming_uniform_init()
        a = nn.Dense(hidden, kernel_init=kaiming, dtype=self.dtype, name="D_fc1")(
            x_rgb
        )
        b = nn.Dense(hidden, kernel_init=kaiming, dtype=self.dtype, name="D_fc2")(
            x_dte
        )
        x = jnp.concatenate([a, b], axis=-1)
        x = nn.Dense(
            hidden, kernel_init=trunc_normal_init(), dtype=self.dtype, name="P_fc2"
        )(x)
        x = nn.Dense(
            dim, kernel_init=trunc_normal_init(), dtype=self.dtype, name="U_fc1"
        )(x)

        gamma_rgb = self.param(
            "tfts_gamma_rgb", _normal_around(1.0, 0.02), (dim,)
        )
        beta_rgb = self.param("tfts_beta_rgb", _normal_around(0.0, 0.02), (dim,))
        gamma_dte = self.param(
            "tfts_gamma_dte", _normal_around(1.0, 0.02), (dim,)
        )
        beta_dte = self.param("tfts_beta_dte", _normal_around(0.0, 0.02), (dim,))

        # Keep the prompts in the compute dtype: the TFTS affine params are
        # f32, and x(bf16) * gamma(f32) promotes to f32 — which then poisons
        # the residual stream of EVERY downstream block (f32 residual adds,
        # LN reads, attention-output upcasts).  Measured in context this
        # promotion cost ~35 ms of the 91 ms bench forward (ablate sweep2:
        # baseline 91.0 -> 55.9 with MPG stubbed, FLOPs are negligible).
        cdt = x.dtype
        p_rgb = x * gamma_rgb.astype(cdt) + beta_rgb.astype(cdt)
        p_dte = x * gamma_dte.astype(cdt) + beta_dte.astype(cdt)
        return x + p_rgb, x + p_dte


def _normal_around(mean: float, std: float):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


class _DWConvParams(nn.Module):
    """Parameter container matching nn.Conv(feature_group_count=C)'s tree
    ({kernel (K, K, 1, C), bias (C,)}) so the shift-FMA depthwise variant
    keeps checkpoint compatibility."""

    kernel_shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.kernel_shape[-1],)
        )
        return k, b


class LayerNormGELUOffset(nn.Module):
    """Offset-prediction head: depthwise conv → LN → GELU → 1x1 conv to 2
    (reference conv_offset_x/y, swin.py:759-770)."""

    channels: int
    ksize: int
    stride: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        pad = self.ksize // 2 if self.ksize != self.stride else 0
        impl = os.environ.get("IR_ADS_DSCF_OFFSET", "conv")
        if impl == "shift":
            # round-5 variant: the depthwise KxK strided conv as K^2
            # strided-slice FMAs (depthwise convs are VPU-lowered on TPU
            # and profiled ~2.4 ms across the 8 offset heads).  Param tree
            # identical to nn.Conv(feature_group_count=C) ({dw: {kernel
            # (K, K, 1, C), bias (C,)}}), so checkpoints are unchanged.
            k, s = self.ksize, self.stride
            kern, dbias = _DWConvParams(
                (k, k, 1, self.channels), name="dw"
            )()
            b_, hh, ww, cc = x.shape
            hk = (hh + 2 * pad - k) // s + 1
            wk = (ww + 2 * pad - k) // s + 1
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            acc = None
            for dy in range(k):
                for dx in range(k):
                    sl = jax.lax.slice(
                        xp,
                        (0, dy, dx, 0),
                        (b_, dy + (hk - 1) * s + 1,
                         dx + (wk - 1) * s + 1, cc),
                        (1, s, s, 1),
                    ).astype(jnp.float32)
                    t = sl * kern[dy, dx, 0].astype(jnp.float32)
                    acc = t if acc is None else acc + t
            x = (acc + dbias.astype(jnp.float32)).astype(
                self.dtype or x.dtype
            )
        else:
            x = nn.Conv(
                self.channels,
                (self.ksize, self.ksize),
                strides=(self.stride, self.stride),
                padding=pad,
                feature_group_count=self.channels,
                dtype=self.dtype,
                name="dw",
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(x)
        return x  # (B, Hk, Wk, 2) as (dy, dx)


class DAttentionMM(nn.Module):
    """Bi-directional deformable cross-modal attention (DSCF core).

    Reference: DAttentionMM, swin.py:726-1025 (defaults: offset_range_factor
    -1, use_pe=True, continuous rpe table sampled by grid_sample).  Both
    modalities predict offset fields; both are sampled at both fields; a
    q-conditioned softmax weight merges the modalities per sample point; then
    every pixel attends over the 2*n_sample deformable keys.
    """

    dim: int  # reduced dims (= stage_dim * dscf_ratio)
    n_heads: int
    n_groups: int
    stride: int
    ksize: int = 9
    level: int = 0
    rpe_size: Tuple[int, int] = (60, 80)  # reference default q_size
    attn_impl: str = "auto"  # "auto" | "pallas" | "xla"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, y: jax.Array, train: bool = False
    ) -> jax.Array:
        b, h, w, c = x.shape
        g = self.n_groups
        heads = self.n_heads
        gc = c // g
        hc = c // heads
        scale = hc**-0.5

        # int8 MXU eval path (IR_ADS_INT8): the DSCF projections are ~424
        # GFLOP of the 480p bench forward (dev/roofline.py) — QuantConv is
        # param-tree identical to nn.Conv, so checkpoints are unaffected
        from ir_ads_tpu.ops.int8 import QuantConv, int8_enabled

        conv_cls = QuantConv if int8_enabled() else nn.Conv

        # fuse_q: conv3x3 + BN + GELU on concat (reference conv_bn_relu)
        if ablated("dscf_fuseq"):  # perf-attribution stub
            xy = x + (0.0 * jnp.mean(y)).astype(x.dtype)
        else:
            xy = jnp.concatenate([x, y], axis=-1)
            xy = conv_cls(
                c, (3, 3), padding=1, dtype=self.dtype, name="fuse_q_conv"
            )(xy)
            xy = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="fuse_q_bn",
            )(xy)
            xy = nn.gelu(xy)
        q = conv_cls(c, (1, 1), dtype=self.dtype, name="proj_q")(xy)

        # offset fields from each modality, per group
        def group_view(t):  # (B, H, W, C) -> (B*g, H, W, gc)
            return (
                t.reshape(b, h, w, g, gc)
                .transpose(0, 3, 1, 2, 4)
                .reshape(b * g, h, w, gc)
            )

        x_off_in = group_view(x)
        y_off_in = group_view(y)
        if ablated("dscf_offsets"):  # perf-attribution stub
            pad = self.ksize // 2 if self.ksize != self.stride else 0
            hk0 = (h + 2 * pad - self.ksize) // self.stride + 1
            wk0 = (w + 2 * pad - self.ksize) // self.stride + 1
            dep = (0.0 * (jnp.mean(x_off_in) + jnp.mean(y_off_in))).astype(
                jnp.float32
            )
            x_offset = jnp.zeros((b * g, hk0, wk0, 2), jnp.float32) + dep
            y_offset = x_offset
        else:
            x_offset = LayerNormGELUOffset(
                gc, self.ksize, self.stride, dtype=self.dtype, name="conv_offset_x"
            )(x_off_in)
            y_offset = LayerNormGELUOffset(
                gc, self.ksize, self.stride, dtype=self.dtype, name="conv_offset_y"
            )(y_off_in)
        hk, wk = x_offset.shape[1], x_offset.shape[2]
        n = hk * wk

        ref = make_ref_grid(hk, wk, b * g, centered=True)  # (B*g,Hk,Wk,2)=(y,x)
        pos_x = jnp.clip(x_offset.astype(jnp.float32) + ref, -1.0, 1.0)
        pos_y = jnp.clip(y_offset.astype(jnp.float32) + ref, -1.0, 1.0)

        # sample each of x / y / q at both offset fields (grid wants (x, y)).
        # matmul formulation: n is small (~300) and shared across queries, so
        # separable hat-weight contractions beat gathers ~30x here (exact —
        # see grid_sample_matmul)
        def sample(feat, pos):
            return grid_sample_matmul(
                group_view(feat), pos[..., ::-1], align_corners=True
            ).reshape(b, g, n, gc)

        def both(feat):  # -> (B, 2n, C) ordered [field_x block, field_y block]
            sx = sample(feat, pos_x)
            sy = sample(feat, pos_y)
            s = jnp.concatenate([sx, sy], axis=2)  # (B, g, 2n, gc)
            return s.transpose(0, 2, 1, 3).reshape(b, 2 * n, c)

        if ablated("dscf_sample"):  # perf-attribution stub
            x_sampled = y_sampled = q_sampled = jnp.zeros(
                (b, 2 * n, c), x.dtype
            )
        else:
            x_sampled = both(x)
            y_sampled = both(y)
            q_sampled = both(q)

        # q-conditioned modality mixing weight (reference get_sample_weight)
        if ablated("dscf_wgt"):  # perf-attribution stub
            sampled = x_sampled + (
                0.0 * (jnp.mean(q_sampled) + jnp.mean(y_sampled))
            ).astype(x_sampled.dtype)
        else:
            wgt = conv_cls(c, (1, 1), dtype=self.dtype, name="sample_weight_fc1")(
                q_sampled
            )
            wgt = nn.relu(wgt)
            wgt = conv_cls(2, (1, 1), dtype=self.dtype, name="sample_weight_fc2")(
                wgt
            )
            wgt = jax.nn.softmax(wgt.astype(jnp.float32), axis=-1)
            sampled = (
                wgt[..., 0:1] * x_sampled.astype(jnp.float32)
                + wgt[..., 1:2] * y_sampled.astype(jnp.float32)
            ).astype(x_sampled.dtype)

        k = conv_cls(c, (1, 1), dtype=self.dtype, name="proj_k")(sampled)
        v = conv_cls(c, (1, 1), dtype=self.dtype, name="proj_v")(sampled)

        # continuous relative position bias sampled from a fixed-size table
        rh, rw = self.rpe_size
        rpe_table = self.param(
            "rpe_table",
            trunc_normal_init(0.01),
            (heads, 2 * rh - 1, 2 * rw - 1),
        )
        hg = heads // g  # heads per group
        q_grid = make_ref_grid(h, w, 1, centered=False)[0].reshape(h * w, 2)

        table = rpe_table.reshape(g, hg, 2 * rh - 1, 2 * rw - 1).transpose(
            0, 2, 3, 1
        )  # (g, S1, S2, hg)
        s1, s2 = 2 * rh - 1, 2 * rw - 1
        qy = jnp.arange(h, dtype=jnp.float32) / max(h - 1, 1) * 2.0 - 1.0
        qx = jnp.arange(w, dtype=jnp.float32) / max(w - 1, 1) * 2.0 - 1.0

        def rpe_bias(pos, head_minor=False, head_first=False):
            # pos: (B*g, Hk, Wk, 2) or pre-flattened (B*g, M, 2), as (y, x)
            """Bilinear table sampling as two MXU contractions.

            The sample displacement (q_i - pos_j)/2 separates into a
            per-row and a per-column term (the query grid is a product
            grid), so bilinear interpolation factorizes EXACTLY into
            1-D hat-weight matrices:
              bias[r, c, j] = sum_{s,t} hat(iy(r,j)-s) T[s,t] hat(ix(c,j)-t)
            A gather formulation of the same op (grid_sample) costs ~26M
            scalar gathers here and dominated the whole forward (~700ms on
            v5e); the matmul form is ~10 GMACs (tests/test_swin_parity.py +
            test_dscf_rpe.py verify exact equivalence)."""
            # intermediates are pure bandwidth (the matmuls are ~10 GMACs);
            # in bf16 mode store them half-width — accumulation stays f32.
            # NOTE: a "one flat (b*n*c, S2) @ (S2, S1*hg) matmul per group"
            # rewrite measured 2.5x faster in isolation but 1.7x SLOWER in
            # context (XLA already flattens the broadcast-batched einsum and
            # fuses the hat-weight construction into it; the manual form
            # forced relayouts) — keep the einsum form.
            store = self.dtype or jnp.float32
            pf = pos.reshape(b * g, -1, 2)
            m = pf.shape[1]
            iy = (0.5 * (qy[None, None, :] - pf[:, :, 0:1]) + 1.0) * 0.5 * (s1 - 1)
            ix = (0.5 * (qx[None, None, :] - pf[:, :, 1:2]) + 1.0) * 0.5 * (s2 - 1)
            wy = jnp.maximum(
                0.0, 1.0 - jnp.abs(iy[..., None] - jnp.arange(s1, dtype=jnp.float32))
            ).astype(store)  # (B*g, n, h, S1)
            wx = jnp.maximum(
                0.0, 1.0 - jnp.abs(ix[..., None] - jnp.arange(s2, dtype=jnp.float32))
            ).astype(store)  # (B*g, n, w, S2)
            tb = jnp.broadcast_to(
                table[None].astype(store), (b, g, s1, s2, hg)
            ).reshape(b * g, s1, s2, hg)
            u = jnp.einsum(
                "bste,bnct->bncse", tb, wx, preferred_element_type=jnp.float32
            ).astype(store)  # (B*g, n, w, S1, hg)
            if head_first:
                # head-major, sample-minor layout: the (B*g, hg, HW, M)
                # result reshapes straight into the (B, heads, HW, M)
                # score add with NO transpose, and the einsum's minor
                # output dim is M (hundreds) instead of hg (2) — the
                # hg-minor form uses 2 of 128 lanes on every store
                # (round-4 L3 variant, IR_ADS_DSCF_RPE_XLA=2)
                order = "bercn"
            else:
                order = "brcen" if head_minor else "brcne"
            bias = jnp.einsum(
                f"bnrs,bncse->{order}", wy, u, preferred_element_type=jnp.float32
            ).astype(store)  # (B*g, h, w, [n, hg] or [hg, n]) or head-first
            if head_first:
                return bias.reshape(b * g, hg, h * w, m)
            if head_minor:
                return bias.reshape(b * g, h * w, hg, m)
            return bias.reshape(b * g, h * w, m, hg)

        # Attention implementation choice (perf round 2):
        #   "pallas2": rpe bias built by the Pallas builder kernel
        #     (ops/pallas_dscf_rpe.py — both hat-weight dots in VMEM, no
        #     ~92M-element u/bias HBM intermediates) + the fused attention
        #     kernel (ops/pallas_dscf.py — scores in VMEM).  Wins where the
        #     query grid is large (levels 0-1).
        #   "pallas": round-1 variant — XLA einsum bias + fused attention.
        #   "xla": full einsum path — best at the small levels (2-3), where
        #     per-j kernel dots would be overhead-bound but XLA batches fine.
        # Head e of group gi covers channels [(gi*hg+e)*hc, ...) —
        # group-major, the packed-layout contract of ops/pallas_dscf.py.
        attn_impl = self.attn_impl
        if attn_impl == "auto":
            import os

            override = os.environ.get("IR_ADS_DSCF_ATTN", "")
            if "," in override:  # per-level list, e.g. "pallas3,pallas3,xla,xla"
                parts = override.split(",")
                override = parts[min(self.level, len(parts) - 1)].strip()
            # whole-model sweep on v5e (B=8 480x640 bf16 forward):
            # xla 97.1 ms, pallas 98.2, pallas2 121.2 — the rpe-builder
            # kernel wins in isolation (0.11 ms at L0) but its
            # (B*g, hg, 2n, h, w) -> (B*g, HW, hg, 2n) output relayout
            # costs more than the einsum path XLA already fuses.
            # "pallas3" (round 2) keeps the builder's row-major layout all
            # the way through the attention kernel (transposed scores), so
            # no relayout exists at all: 97.1 -> 62.8 ms whole-model.  It
            # wins at levels 0-2; at level 3 the rows layout wastes lanes
            # (w=20 of 128 — its rpe builder alone profiled 2.9 ms/forward)
            # and the XLA einsum path is faster (dev/probe_dscf_levels:
            # 77.6 -> 75.6 ms whole-model), so level 3 defaults to xla.
            attn_impl = override or (
                "pallas3"
                if (
                    2 * n % 8 == 0
                    and self.level < 3
                    and jax.default_backend() == "tpu"
                )
                else "xla"
            )
        if ablated("dscf_attncore"):  # perf-attribution stub: no scores/
            # softmax/PV/rpe, but k/v projections + layouts stay
            out = q * (
                1.0 + (0.0 * (jnp.sum(k) + jnp.sum(v))).astype(q.dtype)
            )
        elif attn_impl == "pallas4" and 2 * n % 8 == 0:
            # fully-fused: rpe bias built in VMEM scratch INSIDE the
            # attention kernel — the (B*g, hg, h, 2n, w) bias never touches
            # HBM and there is one kernel instead of two
            # (ops/pallas_dscf.dscf_attention_fused)
            from ir_ads_tpu.ops.pallas_dscf import dscf_attention_fused

            store = self.dtype or jnp.float32
            gc_ = c // g
            pos_cat = jnp.concatenate(
                [pos_x.reshape(b * g, n, 2), pos_y.reshape(b * g, n, 2)],
                axis=1,
            )
            table4 = rpe_table.reshape(g, hg, s1, s2)

            def to_groups(t, mm):  # (B, M, C) -> (B*g, M, gc)
                return (
                    t.reshape(b, mm, g, gc_)
                    .transpose(0, 2, 1, 3)
                    .reshape(b * g, mm, gc_)
                )

            qg = to_groups(q.reshape(b, h * w, c), h * w)
            kg = to_groups(k, 2 * n)
            vg = to_groups(v, 2 * n)
            out = dscf_attention_fused(
                qg, kg, vg, pos_cat, table4, h, w, scale, hg, store
            )
            out = (
                out.reshape(b, g, h * w, gc_)
                .transpose(0, 2, 1, 3)
                .reshape(b, h, w, c)
            )
        elif attn_impl == "pallas3" and 2 * n % 8 == 0:
            from ir_ads_tpu.ops.pallas_dscf import dscf_attention_rows
            from ir_ads_tpu.ops.pallas_dscf_rpe import dscf_rpe_bias_rows

            store = self.dtype or jnp.float32
            gc_ = c // g
            mp = -(-2 * n // 8) * 8
            pos_cat = jnp.concatenate(
                [pos_x.reshape(b * g, n, 2), pos_y.reshape(b * g, n, 2)],
                axis=1,
            )
            table4 = rpe_table.reshape(g, hg, s1, s2)
            if ablated("dscf_rpe"):  # perf attribution: builder cost
                bias_rows = (
                    jnp.sum(pos_cat).astype(store) * 0.0
                    + jnp.zeros((b * g, hg, h, 2 * n, w), store)
                )
            else:
                bias_rows = dscf_rpe_bias_rows(
                    pos_cat, table4, h, w, store
                )  # (B*g, hg, h, 2n, w)

            def to_groups(t, m):  # (B, M, C) -> (B*g, M, gc)
                return (
                    t.reshape(b, m, g, gc_)
                    .transpose(0, 2, 1, 3)
                    .reshape(b * g, m, gc_)
                )

            qg = to_groups(q.reshape(b, h * w, c), h * w)
            kg = jnp.pad(
                to_groups(k, 2 * n), ((0, 0), (0, mp - 2 * n), (0, 0))
            )
            vg = jnp.pad(
                to_groups(v, 2 * n), ((0, 0), (0, mp - 2 * n), (0, 0))
            )
            # packed-slot attention dots (block-diag Q, full-K MXU dots):
            # per-level spec "1,1,1,0" or global "1"/"0"; numerics-validated
            # levels 0-2, level 3's shape crashes Mosaic (see dev probe)
            import os

            # default = the measured-best per-level spec (levels 0-2 packed,
            # level 3's whole-plane tile crashes Mosaic; bench r5)
            pk_env = os.environ.get("IR_ADS_DSCF_PACKED", "1,1,1,0")
            if "," in pk_env:
                pk_parts = pk_env.split(",")
                pk_env = pk_parts[min(self.level, len(pk_parts) - 1)].strip()
            packed = pk_env not in ("", "0")
            out = dscf_attention_rows(
                qg, kg, vg, bias_rows, scale, hg, packed
            )
            out = (
                out.reshape(b, g, h * w, gc_)
                .transpose(0, 2, 1, 3)
                .reshape(b, h, w, c)
            )
        elif attn_impl in ("pallas", "pallas2"):
            from ir_ads_tpu.ops.pallas_dscf import NEG_INF, dscf_attention

            gc_ = c // g
            mp = -(-2 * n // 128) * 128
            if attn_impl == "pallas2":
                from ir_ads_tpu.ops.pallas_dscf_rpe import dscf_rpe_bias

                store = self.dtype or jnp.float32
                pos_cat = jnp.concatenate(
                    [pos_x.reshape(b * g, n, 2), pos_y.reshape(b * g, n, 2)],
                    axis=1,
                )
                table4 = rpe_table.reshape(g, hg, s1, s2)
                bias5 = dscf_rpe_bias(
                    pos_cat, table4, h, w, store
                )  # (B*g, hg, 2n, h, w)
                packed = bias5.transpose(0, 3, 4, 1, 2).reshape(
                    b * g, h * w, hg, 2 * n
                )
            else:
                bx = rpe_bias(pos_x, head_minor=True)  # (B*g, HW, hg, n)
                by = rpe_bias(pos_y, head_minor=True)
                packed = jnp.concatenate([bx, by], axis=-1)  # (B*g, HW, hg, 2n)
            packed = jnp.pad(
                packed,
                ((0, 0), (0, 0), (0, 0), (0, mp - 2 * n)),
                constant_values=NEG_INF,
            ).reshape(b * g, h * w, hg * mp)

            def to_groups(t, m):  # (B, M, C) -> (B*g, M, gc)
                return (
                    t.reshape(b, m, g, gc_)
                    .transpose(0, 2, 1, 3)
                    .reshape(b * g, m, gc_)
                )

            qg = to_groups(q.reshape(b, h * w, c), h * w)
            kg = jnp.pad(
                to_groups(k, 2 * n), ((0, 0), (0, mp - 2 * n), (0, 0))
            )
            vg = jnp.pad(
                to_groups(v, 2 * n), ((0, 0), (0, mp - 2 * n), (0, 0))
            )
            out = dscf_attention(qg, kg, vg, packed, scale, hg)
            out = (
                out.reshape(b, g, h * w, gc_)
                .transpose(0, 2, 1, 3)
                .reshape(b, h, w, c)
            )
        else:
            qh = q.reshape(b, h * w, heads, hc).transpose(0, 2, 1, 3)
            kh = k.reshape(b, 2 * n, heads, hc).transpose(0, 2, 1, 3)
            vh = v.reshape(b, 2 * n, heads, hc).transpose(0, 2, 1, 3)
            attn = (
                jnp.einsum(
                    "bhmd,bhnd->bhmn", qh, kh, preferred_element_type=jnp.float32
                )
                * scale
            )
            if not ablated("dscf_rpe"):
                # Round-4: build the bias with the packed Pallas kernel
                # (ops/pallas_dscf_rpe.dscf_rpe_bias_packed) on TPU — the
                # XLA einsum path materializes ~91M-element u intermediates
                # in HBM per call and was the largest slice of the r3
                # per-fusion profile's 5.4 ms rpe total (level 3 runs this
                # branch in production).  The (BG, hg, M, HW) output adds
                # into the (B, heads, HW, M) scores with the transpose
                # fused into the add.  IR_ADS_DSCF_RPE3: pallas|xla|auto.
                import os

                rpe3 = os.environ.get("IR_ADS_DSCF_RPE3", "auto")
                if rpe3 == "auto":
                    # round-4 measured: the packed builder compiles and
                    # matches on CPU/interpret, but in whole-model context
                    # on the relay toolchain it kills the remote compile
                    # helper (HTTP 500, dev/run_r4f.sh log 2026-08-19) —
                    # same failure class as the Mosaic dynamic-gather
                    # no-go (dev/probe_dyngather.py).  Default stays xla;
                    # the kernel remains opt-in for toolchains that can
                    # compile it.
                    rpe3 = "xla"
                # the packed builder is sized for the SMALL levels (its
                # j-chunked u / out blocks scale with h*w); fallback
                # configs run this xla attention branch at every level,
                # where L0's 19200-lane plane would blow the VMEM budget
                if rpe3 == "pallas" and h * w > 2048:
                    rpe3 = "xla"
                if rpe3 == "pallas":
                    from ir_ads_tpu.ops.pallas_dscf_rpe import (
                        dscf_rpe_bias_packed,
                    )

                    store = self.dtype or jnp.float32
                    pos_cat = jnp.concatenate(
                        [
                            pos_x.reshape(b * g, n, 2),
                            pos_y.reshape(b * g, n, 2),
                        ],
                        axis=1,
                    )
                    table4 = rpe_table.reshape(g, hg, s1, s2)
                    bias_p = dscf_rpe_bias_packed(
                        pos_cat, table4, h, w, store
                    )  # (B*g, hg, 2n, HW)
                    bias = bias_p.reshape(b, heads, 2 * n, h * w).transpose(
                        0, 1, 3, 2
                    )
                elif os.environ.get("IR_ADS_DSCF_RPE_XLA", "1") == "2":
                    # round-4 variant: both offset streams through ONE
                    # einsum pair, emitted head-first / sample-minor so
                    # the score add needs no transpose (see rpe_bias)
                    pos_cat = jnp.concatenate(
                        [
                            pos_x.reshape(b * g, n, 2),
                            pos_y.reshape(b * g, n, 2),
                        ],
                        axis=1,
                    )
                    bias = rpe_bias(pos_cat, head_first=True).reshape(
                        b, heads, h * w, 2 * n
                    )
                else:
                    bias_x = rpe_bias(pos_x)
                    bias_y = rpe_bias(pos_y)
                    bias = jnp.concatenate(
                        [bias_x, bias_y], axis=2
                    )  # (B*g, HW, 2n, hg)
                    bias = (
                        bias.reshape(b, g, h * w, 2 * n, hg)
                        .transpose(0, 1, 4, 2, 3)
                        .reshape(b, heads, h * w, 2 * n)
                    )
                attn = attn + bias.astype(attn.dtype)

            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum(
                "bhmn,bhnd->bhmd",
                attn.astype(vh.dtype),
                vh,
                preferred_element_type=jnp.float32,
            ).astype(vh.dtype)
            out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)

        level_weight = (1e-3, 1e-3, 1e-3, 1.0)[self.level]
        deform_w = self.param(
            "deform_weight",
            lambda key, shape: jnp.full(shape, level_weight, jnp.float32),
            (c,),
        )
        identity_w = self.param(
            "identity_weight", nn.initializers.ones, (c,)
        )
        # cast the f32 combiner params to the compute dtype — like the MPG
        # TFTS affine, an f32 multiply here would promote the output stream
        cdt = out.dtype
        return deform_w.astype(cdt) * out + identity_w.astype(cdt) * xy


class DeformMPGBlock(nn.Module):
    """DSCF fusion wrapper: down-project both streams, deformable cross-modal
    attention, up-project (reference swin.py:1071-1091)."""

    dim: int
    stride: int
    n_groups: int
    n_heads: int
    level: int
    ratio: float = 0.125
    attn_impl: str = "auto"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x_rgb: jax.Array, x_dte: jax.Array, train: bool = False
    ) -> jax.Array:
        if ablated("dscf"):  # perf-attribution stub, never set in production
            # keep a runtime data dependency: pure zeros constant-fold and
            # XLA then DCEs the whole fused-head path (measured -0.4 ms)
            return jnp.zeros_like(x_rgb) + (
                0.0 * jnp.mean(x_rgb)
            ).astype(x_rgb.dtype)
        hidden = int(self.dim * self.ratio)
        kaiming = kaiming_uniform_init()
        a = nn.Dense(hidden, kernel_init=kaiming, dtype=self.dtype, name="D_fc1")(
            x_rgb
        )
        bb = nn.Dense(hidden, kernel_init=kaiming, dtype=self.dtype, name="D_fc2")(
            x_dte
        )
        fused = DAttentionMM(
            dim=hidden,
            n_heads=self.n_heads,
            n_groups=self.n_groups,
            stride=self.stride,
            level=self.level,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="deform_atten",
        )(a, bb, train)
        return nn.Dense(
            self.dim, kernel_init=trunc_normal_init(), dtype=self.dtype, name="U_fc1"
        )(fused)


def apply_modality_mask(
    rgb: jax.Array, dte: jax.Array, key: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """MMST modality dropout (reference apply_mask, swin.py:1094-1105).

    Picks two distinct random samples in the batch; zeroes the RGB stream of
    the first and the DTE stream of the second.  Same distribution as the
    reference's random.sample, but expressed with an explicit JAX key so the
    step stays pure/jittable.
    """
    b = rgb.shape[0]
    perm = jax.random.permutation(key, b)
    rgb_mask = (jnp.arange(b) != perm[0]).astype(rgb.dtype)
    dte_mask = (jnp.arange(b) != perm[1 % b]).astype(dte.dtype)
    shape = (b,) + (1,) * (rgb.ndim - 1)
    return rgb * rgb_mask.reshape(shape), dte * dte_mask.reshape(shape)


class SwinTransformer(nn.Module):
    """Dual-stream Swin backbone (reference SwinTransformer, swin.py:1111-1479).

    Returns three 4-scale NHWC pyramids: (fused, rgb, dte).

    Defaults = Swin-B @384 (embed 128, depths (2,2,18,2), heads (4,8,16,32),
    window 12; reference swin.py:1163-1190).  Swin-L: embed_dim=192,
    num_heads=(6,12,24,48).
    """

    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 12
    patch_size: int = 4
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.3
    out_indices: Sequence[int] = (0, 1, 2, 3)
    mapa_ratio: float = 0.125
    adapter_ratio: float = 0.0625
    adapter_drop: float = 0.1
    dscf_ratio: float = 0.125
    use_remat: bool = False
    mmst_mask: bool = True
    attn_impl: str = "auto"  # "pallas" = fused TPU kernel
    dual_batch: bool = False  # opt-in: both streams in one pass (wins at small batch)
    dtype: Optional[Dtype] = None

    # DSCF per-level config (reference swin.py:1263-1265)
    dscf_strides: Sequence[int] = (8, 4, 2, 1)
    dscf_groups: Sequence[int] = (1, 2, 4, 8)
    dscf_heads: Sequence[int] = (2, 4, 8, 16)

    @nn.compact
    def __call__(
        self,
        x_rgb: jax.Array,
        x_dte: jax.Array,
        train: bool = False,
    ) -> Tuple[List[jax.Array], List[jax.Array], List[jax.Array]]:
        num_layers = len(self.depths)
        dims = [self.embed_dim * (2**i) for i in range(num_layers)]
        total_depth = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total_depth)

        x_rgb = PatchEmbed(
            self.embed_dim, self.patch_size, dtype=self.dtype, name="patch_embed"
        )(x_rgb)
        x_dte = PatchEmbed(
            self.embed_dim,
            self.patch_size,
            dtype=self.dtype,
            name="extra_patch_embed",
        )(x_dte)

        if train and self.mmst_mask:
            x_rgb, x_dte = apply_modality_mask(
                x_rgb, x_dte, self.make_rng("mmst")
            )

        outs, outs_rgb, outs_dte = [], [], []
        for i in range(num_layers):
            if not (ablated("mpg") or ablated(f"mpg{i}")):
                prompt_rgb, prompt_dte = MPGBlock(
                    ratio=self.mapa_ratio, dtype=self.dtype, name=f"mpg_{i}"
                )(x_rgb, x_dte)
                x_rgb = x_rgb + prompt_rgb
                x_dte = x_dte + prompt_dte

            stage = SwinStage(
                dim=dims[i],
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                ffn_dim=int(self.mlp_ratio * dims[i]),
                window_size=self.window_size,
                drop_rate=self.drop_rate,
                drop_path_rates=tuple(
                    dpr[sum(self.depths[:i]) : sum(self.depths[: i + 1])]
                ),
                downsample=i < num_layers - 1,
                adapter_ratio=self.adapter_ratio,
                adapter_drop=self.adapter_drop,
                use_remat=self.use_remat,
                attn_impl=self.attn_impl,
                stage_idx=i,
                dtype=self.dtype,
                name=f"stages_{i}",
            )
            if self.dual_batch:
                # both streams through the shared-weight stage in one call:
                # 2x matmul batch (weights identical, so numerics match the
                # reference's sequential two-pass exactly)
                b0 = x_rgb.shape[0]
                both = jnp.concatenate([x_rgb, x_dte], axis=0)
                both, both_out = stage(both, "dual", not train)
                x_rgb, x_dte = both[:b0], both[b0:]
                rgb_out, dte_out = both_out[:b0], both_out[b0:]
            else:
                x_rgb, rgb_out = stage(x_rgb, "rgb", not train)
                x_dte, dte_out = stage(x_dte, "dte", not train)

            if i in self.out_indices:
                rgb_out = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"norm{i}"
                )(rgb_out)
                dte_out = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"extra_norm{i}"
                )(dte_out)
                fused = DeformMPGBlock(
                    dim=dims[i],
                    stride=self.dscf_strides[i],
                    n_groups=self.dscf_groups[i],
                    n_heads=self.dscf_heads[i],
                    level=i,
                    ratio=self.dscf_ratio,
                    attn_impl=self.attn_impl,
                    dtype=self.dtype,
                    name=f"deform_mpg_{i}",
                )(rgb_out, dte_out, train)
                fused = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"fuse_norm{i}"
                )(fused)
                outs.append(fused)
                outs_rgb.append(rgb_out)
                outs_dte.append(dte_out)

        return outs, outs_rgb, outs_dte


def swin_b(**kw) -> SwinTransformer:
    return SwinTransformer(**kw)


def swin_l(**kw) -> SwinTransformer:
    kw.setdefault("embed_dim", 192)
    kw.setdefault("num_heads", (6, 12, 24, 48))
    kw.setdefault("use_remat", True)
    return SwinTransformer(**kw)
