from .present import PresentQueue
from .delta import DeltaPresentQueue
from .app import App, FrameStats
from .profiler import PassProfiler
from .native_sink import NativeFrameSink, native_sink_available

__all__ = [
    "PresentQueue",
    "DeltaPresentQueue",
    "App",
    "FrameStats",
    "PassProfiler",
    "NativeFrameSink",
    "native_sink_available",
]
