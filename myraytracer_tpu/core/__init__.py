from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.core import rng

__all__ = ["V3", "rng"]
