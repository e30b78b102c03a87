"""TPU-native equivalents of the detectron2 ``projects/`` families vendored by
the reference (SURVEY.md §2.4: DeepLab, Panoptic-DeepLab, ViTDet, MViTv2,
TridentNet, TensorMask, PointSup, DensePose, Rethinking-BatchNorm; PointRend's
point sampling already lives in ir_ads_tpu/detection/criterion.py).

Each module cites the reference implementation it re-designs
(/root/reference/detectron2/projects/...) and is written NHWC/flax-first so
everything jits and shards on the standard mesh.
"""

from ir_ads_tpu.models.projects.deeplab import (
    ASPP,
    DeepLabV3Head,
    DeepLabV3PlusHead,
    deeplab_ce_loss,
)
from ir_ads_tpu.models.projects.densepose import DensePoseChartHead, densepose_losses
from ir_ads_tpu.models.projects.mvit import MViT
from ir_ads_tpu.models.projects.panoptic_deeplab import (
    PanopticDeepLabInsEmbedHead,
    PanopticDeepLabSemSegHead,
    get_panoptic_segmentation,
    panoptic_deeplab_losses,
)
from ir_ads_tpu.models.projects.pointsup import (
    get_point_coords_wrt_box,
    point_sup_mask_loss,
)
from ir_ads_tpu.models.projects.precise_bn import recompute_bn_stats
from ir_ads_tpu.models.projects.tensormask import SwapAlign2Nat, swap_align2nat
from ir_ads_tpu.models.projects.tridentnet import TridentBottleneck, TridentConv
from ir_ads_tpu.models.projects.vitdet import SimpleFeaturePyramid, ViTDet

__all__ = [
    "ASPP",
    "DeepLabV3Head",
    "DeepLabV3PlusHead",
    "deeplab_ce_loss",
    "DensePoseChartHead",
    "densepose_losses",
    "MViT",
    "PanopticDeepLabInsEmbedHead",
    "PanopticDeepLabSemSegHead",
    "get_panoptic_segmentation",
    "panoptic_deeplab_losses",
    "get_point_coords_wrt_box",
    "point_sup_mask_loss",
    "recompute_bn_stats",
    "SwapAlign2Nat",
    "swap_align2nat",
    "TridentBottleneck",
    "TridentConv",
    "SimpleFeaturePyramid",
    "ViTDet",
]
