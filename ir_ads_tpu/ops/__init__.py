from ir_ads_tpu.ops.grid_sample import grid_sample, make_ref_grid
from ir_ads_tpu.ops.layers import (
    ConvBN,
    DropPath,
    LayerNorm,
    Mlp,
    PatchEmbed,
    PatchMerging,
    adaptive_pad,
    drop_path,
    kaiming_uniform_init,
    resize_bilinear,
    trunc_normal_init,
)
from ir_ads_tpu.ops.window_attention import (
    gather_rel_pos_bias,
    relative_position_index,
    shift_window_mask,
    window_attention,
    window_partition,
    window_reverse,
)

__all__ = [
    "ConvBN",
    "DropPath",
    "LayerNorm",
    "Mlp",
    "PatchEmbed",
    "PatchMerging",
    "adaptive_pad",
    "drop_path",
    "gather_rel_pos_bias",
    "grid_sample",
    "kaiming_uniform_init",
    "make_ref_grid",
    "relative_position_index",
    "resize_bilinear",
    "shift_window_mask",
    "trunc_normal_init",
    "window_attention",
    "window_partition",
    "window_reverse",
]
