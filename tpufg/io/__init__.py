from tpufg.io.sources import (
    FrameSource,
    RawVideoSource,
    SyntheticSource,
    StdinSource,
    Y4MSource,
    open_source,
)
from tpufg.io.sinks import (
    FrameSink,
    NullSink,
    PNGDirSink,
    RawVideoSink,
    Y4MSink,
    open_sink,
)
