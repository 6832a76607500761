"""Multi-chip rendering over a device mesh.

The reference is a single-process, single-GPU program; its only
"parallelism" is the rasterizer running the fragment shader per pixel
(SURVEY.md §2, parallelism inventory). The TPU build makes distribution
first-class with two (composable) SPMD strategies over a
``jax.sharding.Mesh``:

* **tile sharding** — the framebuffer's row axis is sharded; each chip
  traces its rows entirely locally (embarrassingly parallel, zero
  per-bounce communication; the scene is small and replicated). The only
  cross-chip data movement is the final gather of the image to host.
* **sample sharding** — every chip renders the full image for a disjoint
  window of sample indices; partial radiance sums reduce with
  ``jax.lax.psum`` over ICI.

Because the integrator's RNG is counter-based and keyed on the *global*
(pixel, sample) pair, both modes produce bitwise the same radiance sums as
the single-chip path (up to f32 reduction order in the psum).

Tested on a virtual CPU mesh (``--xla_force_host_platform_device_count``);
the same code drives real ICI-connected TPU meshes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map_impl
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_impl


def shard_map(f, *, mesh, in_specs, out_specs):
    """Version-compat shard_map (check_vma in jax >= 0.8, check_rep before)."""
    try:
        return _shard_map_impl(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except TypeError:  # pragma: no cover - older jax
        return _shard_map_impl(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )

from myraytracer_tpu.render.integrator import make_block_renderer
from myraytracer_tpu.scene.api import Camera


def _resolve_block_factory(block_factory):
    """Pick the per-device block implementation.

    "jnp" = the oracle integrator block; "pallas" = the fused megakernel
    block (kernels/trace.py); None = pallas on TPU, jnp elsewhere. Both
    satisfy the same contract and consume the identical RNG stream, so the
    choice never changes the image.
    """
    if callable(block_factory):
        return block_factory
    if block_factory is None:
        block_factory = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if block_factory == "pallas":
        from myraytracer_tpu.kernels.trace import (
            make_block_renderer as make_pallas_block,
        )

        if jax.default_backend() != "tpu":
            # Same fallback dispatch.renderer_factory applies unsharded:
            # explicit pallas off-TPU runs the kernel in interpret mode
            # (slow but semantically the kernel) instead of crashing at
            # Mosaic compile.
            import functools

            return functools.partial(make_pallas_block, interpret=True)
        return make_pallas_block
    return make_block_renderer


def default_mesh(devices: Optional[Sequence] = None, axis: str = "tiles") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def hybrid_mesh(
    devices: Optional[Sequence] = None, samples: Optional[int] = None
) -> Mesh:
    """2-D (tiles × samples) mesh over ``devices`` (default: all global
    devices — in a multi-process run that spans every host's chips).

    ``samples=None`` picks 2 when the device count is even (rows stay the
    long axis — tile sharding needs no communication, the sample axis
    psum-reduces over ICI), else 1.
    """
    devs = np.asarray(list(devices if devices is not None else jax.devices()))
    n = devs.size
    if samples is None:
        samples = 2 if n % 2 == 0 and n > 1 else 1
    if samples < 1 or n % samples:
        raise ValueError(f"samples axis {samples} must divide {n} devices")
    return Mesh(devs.reshape(n // samples, samples), ("tiles", "samples"))


# -- multi-host ---------------------------------------------------------------


def parse_multihost_spec(spec: str) -> dict:
    """Parse ``coordinator:port[,num_processes,process_id]`` into
    ``jax.distributed.initialize`` kwargs ({} = autodetect everything —
    TPU pod runtimes supply coordination via their own environment)."""
    if not spec:
        return {}
    parts = spec.split(",")
    if len(parts) == 1:
        return {"coordinator_address": parts[0]}
    if len(parts) == 3:
        return {
            "coordinator_address": parts[0],
            "num_processes": int(parts[1]),
            "process_id": int(parts[2]),
        }
    raise ValueError(
        f"multihost spec {spec!r}: want 'host:port' or 'host:port,nprocs,pid'"
    )


def initialize_multihost(spec: str = "") -> None:
    """``jax.distributed.initialize`` for process-spanning meshes.

    Must run before the first JAX backend use. After it, ``jax.devices()``
    returns the *global* device set, ``default_mesh``/``hybrid_mesh`` span
    processes, and the jitted sharded renderers run SPMD across hosts —
    collectives ride ICI within a slice, DCN between them, both inserted
    by XLA (no custom transport; SURVEY.md §5 distributed backend row).
    """
    jax.distributed.initialize(**parse_multihost_spec(spec))


def fetch_array(x) -> np.ndarray:
    """Materialize a (possibly process-sharded) device array on this host.

    Single-process (and fully-addressable) arrays take the plain
    ``jax.device_get`` path; under multi-process semantics a jitted
    output's shards live on other hosts' devices, where ``np.asarray``
    would throw — ``process_allgather`` assembles the global array from
    each host's addressable shards instead.
    """
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def make_tile_sharded_renderer(
    cam: Camera,
    width: int,
    height: int,
    samples_per_frame: int,
    ray_depth: int,
    t_min: float = 1e-3,
    t_max: float = 1e4,
    sample_batch: int = 1,
    mesh: Optional[Mesh] = None,
    material_set=None,
    static_ior=None,
    sky=None,
    nee_lights=None,
    block_factory=None,
    frames: int = 1,
    texture_set=None,
    qmc: bool = False,
    rr: int = 0,
):
    """Shard image rows across the mesh; each chip renders its rows locally.

    ``frames=K > 1`` renders K progressive frames per call (the
    small-spp streaming mode, render/session.py frame batching), each
    chip still tracing only its rows: the Pallas block batches the
    frames natively in one kernel call (shared in-kernel regeneration
    tail); the jnp oracle block runs K single-frame passes in one jit.
    Returns ``[K, 3, height, width]`` per-frame mean images — bitwise
    the K separate single-frame calls. Tile sharding composes with
    frame batching because each chip's sample window stays contiguous
    across frames; the sample/hybrid modes' windows do not (their
    makers reject frames > 1).
    """
    mesh = mesh or default_mesh()
    axis = mesh.axis_names[0]
    nd = mesh.shape[axis]
    spp = int(samples_per_frame)
    frames = int(frames)

    rows_per = _ceil_div(height, nd)

    factory = _resolve_block_factory(block_factory)
    import inspect

    native_frames = "frames" in inspect.signature(factory).parameters
    extra = {"frames": frames} if frames > 1 and native_frames else {}
    block = factory(
        cam, width, height, rows_per, spp, ray_depth,
        t_min=t_min, t_max=t_max, sample_batch=sample_batch,
        material_set=material_set, static_ior=static_ior, sky=sky,
        nee_lights=nee_lights, texture_set=texture_set, qmc=qmc, rr=rr,
        **extra,
    )
    if frames > 1 and not native_frames:
        single = block

        def block(scene, key, row0, sample_start, n_valid):
            # Generic per-frame loop around a single-frame block (the
            # jnp oracle): frame f is exactly the single-frame call at
            # sample offset f*spp, stacked channels-first to match the
            # Pallas multi-frame layout.
            del n_valid
            outs = [
                single(
                    scene, key, row0,
                    sample_start + jnp.uint32(f * spp), jnp.uint32(spp),
                )
                for f in range(frames)
            ]
            img = jnp.stack(
                [jnp.transpose(o[0], (2, 0, 1)) for o in outs]
            )
            segs = outs[0][1]
            for o in outs[1:]:
                segs = segs + o[1]
            return img, segs

    def local(scene, key, sample_base):
        tile = jax.lax.axis_index(axis).astype(jnp.uint32)
        row0 = tile * jnp.uint32(rows_per)
        img_sum, segs = block(
            scene, key, row0, sample_base, jnp.uint32(frames * spp)
        )
        # Rows beyond the true image height are traced (static shapes) but
        # cropped after the gather; their radiance is finite garbage.
        return img_sum * jnp.float32(1.0 / spp), segs[None]

    img_spec = (P(None, None, axis, None) if frames > 1
                else P(axis, None, None))
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(img_spec, P(axis)),
    )

    @jax.jit
    def render(scene, key, sample_base):
        img, segs = sharded(scene, key, jnp.asarray(sample_base, jnp.uint32))
        img = img[:, :, :height] if frames > 1 else img[:height]
        return img, jnp.sum(segs)

    return render


def make_sample_sharded_renderer(
    cam: Camera,
    width: int,
    height: int,
    samples_per_frame: int,
    ray_depth: int,
    t_min: float = 1e-3,
    t_max: float = 1e4,
    sample_batch: int = 1,
    mesh: Optional[Mesh] = None,
    material_set=None,
    static_ior=None,
    sky=None,
    nee_lights=None,
    block_factory=None,
    frames: int = 1,
    texture_set=None,
    qmc: bool = False,
    rr: int = 0,
):
    """Each chip renders the full frame for a disjoint sample window; the
    partial sums reduce over ICI with psum."""
    if frames > 1:
        raise ValueError(
            "frame batching requires shard 'tiles' or 'none': a "
            "sample-sharded device's window is not contiguous across "
            "frame buckets"
        )
    mesh = mesh or default_mesh(axis="samples")
    axis = mesh.axis_names[0]
    nd = mesh.shape[axis]
    spp = int(samples_per_frame)
    per_dev = _ceil_div(spp, nd)

    block = _resolve_block_factory(block_factory)(
        cam, width, height, height, per_dev, ray_depth,
        t_min=t_min, t_max=t_max, sample_batch=sample_batch,
        material_set=material_set, static_ior=static_ior, sky=sky,
        nee_lights=nee_lights, texture_set=texture_set, qmc=qmc, rr=rr,
    )

    def local(scene, key, sample_base):
        idx = jax.lax.axis_index(axis).astype(jnp.uint32)
        start_off = idx * jnp.uint32(per_dev)
        n_valid = jnp.clip(
            jnp.int32(spp) - start_off.astype(jnp.int32), 0, per_dev
        ).astype(jnp.uint32)
        img_sum, segs = block(scene, key, jnp.uint32(0), sample_base + start_off, n_valid)
        img_sum = jax.lax.psum(img_sum, axis)
        segs = jax.lax.psum(segs, axis)
        return img_sum * jnp.float32(1.0 / spp), segs

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
    )

    @jax.jit
    def render(scene, key, sample_base):
        return sharded(scene, key, jnp.asarray(sample_base, jnp.uint32))

    return render


def make_hybrid_sharded_renderer(
    cam: Camera,
    width: int,
    height: int,
    samples_per_frame: int,
    ray_depth: int,
    t_min: float = 1e-3,
    t_max: float = 1e4,
    sample_batch: int = 1,
    mesh: Optional[Mesh] = None,
    material_set=None,
    static_ior=None,
    sky=None,
    nee_lights=None,
    block_factory=None,
    frames: int = 1,
    texture_set=None,
    qmc: bool = False,
    rr: int = 0,
):
    """2-D mesh: image rows sharded over "tiles", samples over "samples".

    Each device traces (its rows) × (its sample window); partial radiance
    sums reduce with psum over the "samples" axis only (the tile axis needs
    no communication), then the row shards assemble into the frame. This is
    the general form; the 1-D tile / sample renderers are its degenerate
    cases, kept separate for clarity.
    """
    if frames > 1:
        raise ValueError(
            "frame batching requires shard 'tiles' or 'none': a "
            "sample-sharded device's window is not contiguous across "
            "frame buckets"
        )
    if mesh is None:
        mesh = hybrid_mesh()
    nd_t = mesh.shape["tiles"]
    nd_s = mesh.shape["samples"]
    spp = int(samples_per_frame)
    rows_per = _ceil_div(height, nd_t)
    per_dev = _ceil_div(spp, nd_s)

    block = _resolve_block_factory(block_factory)(
        cam, width, height, rows_per, per_dev, ray_depth,
        t_min=t_min, t_max=t_max, sample_batch=sample_batch,
        material_set=material_set, static_ior=static_ior, sky=sky,
        nee_lights=nee_lights, texture_set=texture_set, qmc=qmc, rr=rr,
    )

    def local(scene, key, sample_base):
        tile = jax.lax.axis_index("tiles").astype(jnp.uint32)
        sidx = jax.lax.axis_index("samples").astype(jnp.uint32)
        row0 = tile * jnp.uint32(rows_per)
        start_off = sidx * jnp.uint32(per_dev)
        n_valid = jnp.clip(
            jnp.int32(spp) - start_off.astype(jnp.int32), 0, per_dev
        ).astype(jnp.uint32)
        img_sum, segs = block(scene, key, row0, sample_base + start_off, n_valid)
        img_sum = jax.lax.psum(img_sum, "samples")
        segs = jax.lax.psum(segs, "samples")
        return img_sum * jnp.float32(1.0 / spp), segs[None]

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P("tiles", None, None), P("tiles")),
    )

    @jax.jit
    def render(scene, key, sample_base):
        img, segs = sharded(scene, key, jnp.asarray(sample_base, jnp.uint32))
        return img[:height], jnp.sum(segs)

    return render


def shard_renderer_factory(
    base_factory, mode: str, mesh: Optional[Mesh] = None, block_factory=None
):
    """Adapt a sharding mode to the RenderSession renderer-factory protocol.

    ``base_factory`` is accepted for interface compatibility (the sharded
    renderers build on block renderers directly); ``block_factory`` picks
    the per-device implementation ("jnp" | "pallas" | callable | None=auto).
    """
    del base_factory
    if mode == "tiles":
        maker = make_tile_sharded_renderer
    elif mode == "samples":
        maker = make_sample_sharded_renderer
    elif mode == "hybrid":
        maker = make_hybrid_sharded_renderer
    else:
        raise ValueError(f"unknown shard mode {mode!r}")

    def factory(cam, width, height, samples_per_frame, ray_depth, **kw):
        return maker(
            cam, width, height, samples_per_frame, ray_depth, mesh=mesh,
            block_factory=block_factory, **kw
        )

    return factory
