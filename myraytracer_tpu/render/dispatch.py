"""Backend dispatch: choose the renderer factory for a config.

Four compute paths produce frames with identical semantics (and, for jnp
vs pallas, the identical threefry sample stream):

* ``jnp``    — the pure-jnp wavefront oracle (render/integrator.py);
* ``pallas`` — the fused Pallas megakernel (kernels/trace.py);
* ``cpu``    — the native C++ SAH-BVH renderer (native/cpu_backend.py;
  a different — mt19937 — sample stream, so images agree statistically);
* sharding wraps the jnp/pallas paths over a device mesh
  (parallel/sharding.py).

``auto`` resolves to pallas on TPU backends and jnp elsewhere — except
that on TPU hosts, eligible large scenes route to ``cpu`` when the
measured throughput models predict the host's cores out-render the TPU
kernel (BENCH.md "Backend routing"; the 25k-tri/40k-sphere regimes where
per-ray log-tree traversal beats per-tile conservative gating).
"""

from __future__ import annotations

import jax

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.render.integrator import make_renderer as make_jnp_renderer
from myraytracer_tpu.render.session import RenderSession
from myraytracer_tpu.scene import api


def _device_backend() -> str:
    """jax.default_backend(), indirected for tests (which force the CPU
    platform but need to exercise the TPU routing decision)."""
    return jax.default_backend()


def resolve_backend(config: RenderConfig) -> str:
    if config.backend != "auto":
        return config.backend
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def renderer_factory(config: RenderConfig, world: api.World = None):
    backend = resolve_backend(config)
    if backend == "cpu":
        from myraytracer_tpu.native import cpu_backend

        if world is None:
            raise ValueError(
                "backend cpu builds its factory from the API world "
                "(native scene dump); use make_session"
            )
        reason = cpu_backend.cpu_ineligibility(world, config)
        if reason is not None:
            raise ValueError(f"backend cpu does not support {reason}")
        return cpu_backend.make_cpu_factory(world)
    if backend == "pallas":
        try:
            from myraytracer_tpu.kernels.trace import make_renderer as make_pallas
            factory = make_pallas
            if jax.default_backend() != "tpu":
                # Explicit pallas off-TPU: run the kernel in interpret
                # mode (slow, but semantically the kernel — what the
                # parity tests do) instead of failing at Mosaic compile.
                import functools
                import logging

                logging.getLogger("myraytracer_tpu").warning(
                    "pallas backend on %s: using interpret mode (slow)",
                    jax.default_backend(),
                )
                factory = functools.partial(make_pallas, interpret=True)
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
    cfg = config
    routed_pred = None
    if config.backend == "auto":
        from myraytracer_tpu.native import cpu_backend

        routed = cpu_backend.auto_route(world, config, _device_backend())
        if routed == "cpu":
            # Recorded in checkpoint provenance as backend="cpu" (a
            # different sample stream than the TPU paths). The model's
            # prediction rides on the session (attached at the common
            # construction below): the CLI compares the first
            # steady-state frame against it and warns on a >3x miss —
            # the runtime guard against silent misrouting on other
            # hardware (BENCH.md "Backend routing").
            cfg = config.replace(backend="cpu")
            routed_pred = cpu_backend.route_prediction(world, config)
    if resolve_backend(cfg) == "pallas" and cfg.backend == "auto":
        # Large primitive tables move to VMEM automatically (no practical
        # cap — kernels/trace.py TRI_VMEM/SPH_VMEM); only scenes whose
        # AABB *gate* tables alone exceed the SMEM budget (tens of
        # millions of primitives) route to the jnp oracle.
        downgrade = None
        if api.TEXTURE_IMAGE in world.texture_set:
            # Per-lane bitmap gathers have no Mosaic lowering; the jnp
            # integrator's XLA gather handles them (kernels/trace.py
            # rejection message, BENCH.md "Image textures").
            downgrade = "image-textured scene (per-lane bitmap gather)"
        try:
            from myraytracer_tpu.kernels.trace import fits_in_smem
        except (ImportError, NotImplementedError):
            # Pallas unavailable: downgrade the CONFIG (not just the
            # factory) so the session's backend provenance — recorded in
            # checkpoints to refuse cross-compiler resumes — matches the
            # jnp renderer that will actually run.
            downgrade = "pallas unavailable"
        else:
            # Margins cover the kernel's exact padded-table re-check
            # (spheres pad to LEADERS + k*CULL_CHUNK, triangles to
            # k*TRI_CHUNK): this check must be at least as strict, so
            # auto mode never compiles into the kernel's ValueError at
            # the boundary.
            if not fits_in_smem(
                len(world.spheres) + 192, world.triangle_count + 128,
                tri_table_in_smem=False, sph_table_in_smem=False,
                textured=bool(world.texture_set),
            ):
                downgrade = (
                    f"scene ({len(world.spheres)} spheres, "
                    f"{world.triangle_count} triangles) exceeds the "
                    f"Pallas kernel's SMEM budget"
                )
        if downgrade:
            import dataclasses
            import logging

            logging.getLogger("myraytracer_tpu").warning(
                "%s; auto backend falls back to jnp", downgrade
            )
            cfg = dataclasses.replace(cfg, backend="jnp")
    session = RenderSession(
        world, cfg, renderer_factory=renderer_factory(cfg, world=world)
    )
    if routed_pred is not None:
        session.routing_prediction = routed_pred[0]
    return session
