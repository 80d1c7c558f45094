from tpufg.engine.pipeline import make_interp_step, make_scale_step
from tpufg.engine.runner import StreamingEngine, run_stream
