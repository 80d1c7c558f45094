from tpufg.kernels.lanczos import lanczos_scale_fast
