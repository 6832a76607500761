from myraytracer_tpu.utils.profiling import profile_trace, enable_debug_nans

__all__ = ["profile_trace", "enable_debug_nans"]
