"""Model registry (replaces the reference's eval()-based lookup,
train_mm.py:42-46)."""

from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from ir_ads_tpu.models.cmnext import CMNeXt
from ir_ads_tpu.models.backbones.mit import MiTDualStream, MIT_SETTINGS
from ir_ads_tpu.models.backbones.cmx import CMX as CMXBackbone
from ir_ads_tpu.models.heads.segformer import SegFormerHead
from ir_ads_tpu.ops.layers import resize_bilinear


class CMNeXtLegacy(nn.Module):
    """Single-head legacy model: MiT-family dual-stream backbone (CMNeXt-Bx)
    or CMX, decoded by one SegFormer head (reference tools/ originals and
    cmx usage).  Returns a 3-tuple like CMNeXt with the aux logits aliased
    to the fused head so the same train/eval drivers work."""

    backbone: str = "CMNeXt-B2"  # or CMX-B2
    num_classes: int = 25
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x_rgb, x_dte, train: bool = False):
        family, variant = self.backbone.split("-")
        if family == "CMNeXt":
            feats = MiTDualStream(variant=variant, dtype=self.dtype,
                                  name="backbone")(x_rgb, x_dte, train)
        elif family == "CMX":
            feats = CMXBackbone(variant=variant, dtype=self.dtype,
                                name="backbone")(x_rgb, x_dte, train)
        else:
            raise ValueError(f"unknown legacy backbone {self.backbone!r}")
        y = SegFormerHead(256, self.num_classes, dtype=self.dtype,
                          name="decode_head")(feats, train)
        y = resize_bilinear(y, x_rgb.shape[1:3], align_corners=False)
        return y, y, y


def build_model(name: str, backbone: str, num_classes: int, **kw):
    if backbone.startswith("SwinTransformer"):
        return CMNeXt(backbone=backbone, num_classes=num_classes, **kw)
    if backbone.split("-")[0] in ("CMNeXt", "CMX"):
        kw.pop("backbone_kwargs", None)
        kw.pop("mmst_mask", None)
        return CMNeXtLegacy(backbone=backbone, num_classes=num_classes, **kw)
    raise ValueError(f"unknown model {name!r} / backbone {backbone!r}")


MODELS = {"CMNeXt": CMNeXt, "CMNeXtLegacy": CMNeXtLegacy}

__all__ = ["CMNeXt", "CMNeXtLegacy", "MODELS", "build_model"]
