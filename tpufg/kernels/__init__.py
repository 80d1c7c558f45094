from tpufg.kernels.convert import frames_to_planar, planar_to_frames
from tpufg.kernels.lanczos import lanczos_scale_fast
from tpufg.kernels.motion import motion_search_tiled
from tpufg.kernels.warp import warp_blend_block
