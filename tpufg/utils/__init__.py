from tpufg.utils.logging import Logger, LogLevel, get_logger
from tpufg.utils.stats import FpsWindow, LatencyRecorder
