"""CMNeXt — the IR-ADS segmentation model: dual-stream Swin backbone + three
SegFormer decode heads (fused / rgb-only / dte-only).

Reference: semseg/models/cmnext.py:11-33 — the fused head uses embed_dim 512,
the two auxiliary modality heads 256; all three logits are bilinearly
upsampled to the input resolution.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ir_ads_tpu.models.backbones.swin import SwinTransformer, swin_b, swin_l
from ir_ads_tpu.models.heads.segformer import SegFormerHead
from ir_ads_tpu.ops.layers import resize_bilinear
from ir_ads_tpu.utils.ablate import ablated

BACKBONES = {
    "SwinTransformer-B": swin_b,
    "SwinTransformer-L": swin_l,
}


class CMNeXt(nn.Module):
    backbone: str = "SwinTransformer-B"
    num_classes: int = 40
    use_remat: bool = False
    mmst_mask: bool = True
    dtype: Optional[Any] = None
    # overrides for the backbone (tests / ablations), e.g. tiny dims
    backbone_kwargs: Optional[Any] = None
    head_dims: Tuple[int, int] = (512, 256)  # fused, aux (reference cmnext.py:20-22)
    head_drop: float = 0.1  # SegFormer head dropout (train mode)
    # False -> return logits at the heads' native H/4 resolution.  Eval
    # wrappers that ensemble (flip/MSF) can then sum BEFORE the bilinear
    # upsample — exact by linearity — and upsample once: the full-res
    # (B, H, W, C) flip-add was ~1 ms of pure HBM traffic on the headline
    # bench (round 4).  Training keeps the default (losses are computed at
    # label resolution, reference train_mm.py semantics).
    upsample_logits: bool = True

    @nn.compact
    def __call__(
        self,
        x_rgb: jax.Array,  # (B, H, W, 3)
        x_dte: jax.Array,  # (B, H, W, 3)
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if self.backbone not in BACKBONES:
            raise ValueError(f"Unknown backbone {self.backbone!r}")
        kwargs = dict(self.backbone_kwargs or {})
        bb = BACKBONES[self.backbone](
            dtype=self.dtype,
            use_remat=self.use_remat or self.backbone.endswith("-L"),
            mmst_mask=self.mmst_mask,
            name="backbone",
            **kwargs,
        )
        feats, feats_rgb, feats_dte = bb(x_rgb, x_dte, train)

        # rank-3 = FLAT (B, H, W*3) lane-dense input (see PatchEmbed)
        size = (
            (x_rgb.shape[1], x_rgb.shape[2] // 3)
            if x_rgb.ndim == 3
            else (x_rgb.shape[1], x_rgb.shape[2])
        )
        fused_dim, aux_dim = self.head_dims
        if ablated("head"):  # perf-attribution stub
            # consume EVERY pyramid level: touching only feats[0] lets XLA
            # DCE the other levels' DSCF blocks, overstating the head cost
            probe = sum(jnp.sum(f).astype(jnp.float32) for f in feats)
            y = probe.astype(feats[0].dtype) * jnp.zeros(
                (1, 1, 1, self.num_classes), feats[0].dtype
            )
        else:
            y = SegFormerHead(
                fused_dim, self.num_classes, drop=self.head_drop,
                dtype=self.dtype, name="decode_head"
            )(feats, train)
        y_rgb = SegFormerHead(
            aux_dim, self.num_classes, drop=self.head_drop,
            dtype=self.dtype, name="decode_head_rgb"
        )(feats_rgb, train)
        y_dte = SegFormerHead(
            aux_dim, self.num_classes, drop=self.head_drop,
            dtype=self.dtype, name="decode_head_dte"
        )(feats_dte, train)

        if self.upsample_logits:
            y = resize_bilinear(y, size, align_corners=False)
            y_rgb = resize_bilinear(y_rgb, size, align_corners=False)
            y_dte = resize_bilinear(y_dte, size, align_corners=False)
        return y, y_rgb, y_dte
