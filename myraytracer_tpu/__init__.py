"""myraytracer_tpu — a TPU-native progressive path-tracing framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference Rust+WGSL progressive ray tracer (zetanumbers/myraytracer):

- Python scene-description API: spheres with Lambertian / Metal materials
  (reference ``raytracer/src/lib.rs:611-639``) extended with Dielectric and
  a positionable thin-lens camera.
- A wavefront integrator that re-expresses the reference's divergent
  per-pixel bounce loop (``raytracer/src/shader.wgsl:336-358``) as an
  iterative masked loop over SoA ray batches.
- Counter-based threefry2x32 RNG keyed on (pixel, sample, bounce) — frames
  are bit-reproducible, replacing the reference's stateful per-pixel
  xoshiro128+ (``raytracer/src/shader.wgsl:36-94``).
- Progressive sample accumulation with the reference's EMA-capped
  running-mean semantics (``raytracer/src/lib.rs:300-306``).
- Gamma-corrected PPM/PNG output, image-tile sharding across chips via
  ``shard_map``, and fused Pallas trace kernels.
"""

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.scene.api import (
    Camera,
    Dielectric,
    Lambertian,
    Metal,
    Sphere,
    World,
)
from myraytracer_tpu.scene.compile import CompiledScene, compile_scene
from myraytracer_tpu.render.session import RenderSession

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "CompiledScene",
    "Dielectric",
    "Lambertian",
    "Metal",
    "RenderConfig",
    "RenderSession",
    "Sphere",
    "World",
    "compile_scene",
    "__version__",
]
