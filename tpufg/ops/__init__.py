from tpufg.ops.oracle import (
    bilinear_sample,
    dequantize_unorm8,
    lanczos_scale,
    lanczos_weight,
    motion_search,
    quantize_unorm8,
    warp_blend,
)
