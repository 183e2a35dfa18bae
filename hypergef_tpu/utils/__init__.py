from hypergef_tpu.utils.timing import device_time_per_iter, Timer

__all__ = ["device_time_per_iter", "Timer"]
