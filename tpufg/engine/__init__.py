from tpufg.engine.pipeline import (make_interp_step, make_scale_step,
                                   mv_lattice_shape)
from tpufg.engine.runner import (StreamingEngine, run_sharded_stream,
                                 run_stream)
