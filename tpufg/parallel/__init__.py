from tpufg.parallel.spatial import (
    halo_exchange_rows,
    make_sharded_interp_step,
    make_sharded_q_init,
    make_spatial_mesh,
    sharded_q_shapes,
)
