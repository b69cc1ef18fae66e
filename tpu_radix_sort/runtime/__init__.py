"""Runtime layer: device timing, profiling, native CPU baseline."""
from .timing import device_time

__all__ = ["device_time"]
