from ir_ads_tpu.models.heads.align_heads import FaPNHead, LawinHead, SFHead
from ir_ads_tpu.models.heads.extra_heads import (
    CondHead,
    FCNHead,
    FPNHead,
    LightHamHead,
    UPerHead,
)
from ir_ads_tpu.models.heads.segformer import SegFormerHead

HEADS = {
    "SegFormerHead": SegFormerHead,
    "UPerHead": UPerHead,
    "LightHamHead": LightHamHead,
    "FPNHead": FPNHead,
    "FCNHead": FCNHead,
    "CondHead": CondHead,
    "SFHead": SFHead,
    "FaPNHead": FaPNHead,
    "LawinHead": LawinHead,
}

__all__ = [*HEADS, "HEADS"]
