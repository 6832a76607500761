"""Backend dispatch: choose the renderer factory for a config.

Three compute paths produce frames with identical semantics (and, for jnp
vs pallas, the identical threefry sample stream):

* ``jnp``    — the pure-jnp wavefront oracle (render/integrator.py);
* ``pallas`` — the fused Pallas megakernel (kernels/trace.py);
* sharding wraps either path over a device mesh (parallel/sharding.py).

``auto`` resolves to pallas on TPU backends and jnp elsewhere.
"""

from __future__ import annotations

import jax

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.render.integrator import make_renderer as make_jnp_renderer
from myraytracer_tpu.render.session import RenderSession
from myraytracer_tpu.scene import api


def resolve_backend(config: RenderConfig) -> str:
    if config.backend != "auto":
        return config.backend
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def renderer_factory(config: RenderConfig):
    backend = resolve_backend(config)
    if backend == "pallas":
        try:
            from myraytracer_tpu.kernels.trace import make_renderer as make_pallas
            factory = make_pallas
        except (ImportError, NotImplementedError):
            if config.backend == "pallas":
                raise
            factory = make_jnp_renderer
    else:
        factory = make_jnp_renderer

    if config.shard != "none":
        from myraytracer_tpu.parallel.sharding import shard_renderer_factory

        return shard_renderer_factory(
            factory, config.shard, block_factory=backend
        )
    return factory


def make_session(world: api.World, config: RenderConfig) -> RenderSession:
    return RenderSession(world, config, renderer_factory=renderer_factory(config))
