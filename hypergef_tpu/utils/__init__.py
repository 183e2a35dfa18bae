from hypergef_tpu.utils.timing import Timer, device_time_per_iter, sync
from hypergef_tpu.utils.platform import apply_platform_env

__all__ = ["device_time_per_iter", "Timer", "sync", "apply_platform_env"]
