"""DINO-R50 deformable-mask base model config (reference
projects/vCLR_deformable_mask/configs/models/dino_r50.py:21-147):
FrozenBN R50, 4-level ChannelMapper, 6+6 layers, 2000 queries, CDN 100."""

from ir_ads_tpu.detection.dino import DINODetector
from ir_ads_tpu.utils.lazy_config import L

model = L(DINODetector)(
    num_classes=20,
    num_queries=2000,
    embed_dim=256,
    num_encoder_layers=6,
    num_decoder_layers=6,
    num_levels=4,
    backbone_arch="resnet50",
    dn_number=100,
    label_noise_ratio=0.5,
    box_noise_scale=1.0,
    max_gt=20,
)
