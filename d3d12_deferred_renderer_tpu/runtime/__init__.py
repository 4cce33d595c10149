from .present import PresentQueue
from .app import App, FrameStats
from .profiler import PassProfiler

__all__ = ["PresentQueue", "App", "FrameStats", "PassProfiler"]
