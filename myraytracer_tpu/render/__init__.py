from myraytracer_tpu.render.integrator import make_renderer
from myraytracer_tpu.render.session import RenderSession

__all__ = ["make_renderer", "RenderSession"]
