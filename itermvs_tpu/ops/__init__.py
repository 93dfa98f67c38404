from itermvs_tpu.ops.depth_range import depth_normalization, depth_unnormalization
from itermvs_tpu.ops.resize import (
    resize_bilinear,
    upsample_bilinear,
    resize_nearest,
)
from itermvs_tpu.ops.grid_sample import grid_sample, pack_corners
from itermvs_tpu.ops.warping import (
    differentiable_warp,
    pack_bilinear,
    warp_corr,
    warp_corr_packed,
)
from itermvs_tpu.ops.upsample import convex_upsample

__all__ = [
    "depth_normalization", "depth_unnormalization",
    "resize_bilinear", "upsample_bilinear", "resize_nearest",
    "grid_sample", "pack_corners",
    "differentiable_warp", "pack_bilinear", "warp_corr", "warp_corr_packed",
    "convex_upsample",
]
