from ir_ads_tpu.detection.box_ops import (
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    masks_to_boxes,
)
from ir_ads_tpu.detection.dino import DINODetector, nms_topk
from ir_ads_tpu.detection.ema import ema_init, ema_update
from ir_ads_tpu.detection.matcher import dynamic_k_match, hungarian_match, match_cost
from ir_ads_tpu.detection.meta_arch import (
    FCOS,
    FPN,
    FasterRCNN,
    KeypointRCNN,
    MaskRCNN,
    RetinaNet,
)
from ir_ads_tpu.detection.msdeform_attn import MSDeformAttention, ms_deform_attn
from ir_ads_tpu.detection.transformer import DINOTransformer

__all__ = [
    "DINODetector", "DINOTransformer", "FCOS", "FPN", "FasterRCNN",
    "KeypointRCNN", "MaskRCNN",
    "MSDeformAttention", "RetinaNet", "box_cxcywh_to_xyxy", "box_iou",
    "box_xyxy_to_cxcywh", "dynamic_k_match", "ema_init", "ema_update",
    "generalized_box_iou", "hungarian_match", "masks_to_boxes",
    "match_cost", "ms_deform_attn", "nms_topk",
]
