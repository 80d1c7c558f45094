from tpufg.parallel.spatial import (
    halo_exchange_rows,
    make_sharded_interp_step,
    make_spatial_mesh,
)
