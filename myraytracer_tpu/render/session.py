"""Progressive render session.

Host-side analog of the reference's application/render-state machinery
(``App``/``State``, ``raytracer/src/lib.rs:72-307``): owns the accumulation
framebuffer and drives frame steps. There is no window or event loop on a
TPU host, so the winit state machine and the async-init waker
(``waker.rs``) collapse into a plain object — JAX dispatch is already
asynchronous, and ``block_until_ready`` marks frame boundaries.

Accumulation reproduces ``State::redraw``'s blend exactly
(``lib.rs:299-306``, ``shader.wgsl:385``):

    fb' = mix(frame_mean, fb, w)   with   w = min(max_weight, n / (n + 1))

where ``n`` counts completed frames; the initial weight is 0
(``lib.rs:424``), so with ``max_weight = 1`` the framebuffer is the exact
running mean over frames, and a smaller cap gives a responsive EMA.

Unlike the reference — where accumulation lives only in a GPU texture and
dies with the window — sessions checkpoint: ``(framebuffer, frame_count,
sample_cursor, seed)`` round-trips through an npz, and a resumed session
continues the *identical* sample stream (counter-based RNG, SURVEY.md §5).
"""

from __future__ import annotations

import json
import pathlib
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.render.integrator import make_renderer
from myraytracer_tpu.scene import api
from myraytracer_tpu.render.lights import extract_lights as _extract_lights
from myraytracer_tpu.scene.compile import compile_scene

CHECKPOINT_VERSION = 3


@jax.jit
def _blend_chain(fb_hwc, imgs_kchw, weights):
    """Sequentially blend K per-frame images into the framebuffer with
    per-frame weights. Both batch sizes route through this one jit so the
    compiled arithmetic is identical — a frame-batched step is bitwise
    the framebuffer K single steps produce. Images arrive channels-first
    ([K,3,H,W]; a trailing 3 would pad to 128 under TPU tiling) and the
    transposes are value-exact."""

    def body(fb, iw):
        img, w = iw
        return img * (1.0 - w) + fb * w, None

    fb, _ = jax.lax.scan(
        body, jnp.transpose(fb_hwc, (2, 0, 1)), (imgs_kchw, weights)
    )
    return jnp.transpose(fb, (1, 2, 0))


def scene_fingerprint(scene) -> str:
    """Content hash of the compiled scene geometry/materials (not camera).

    Resuming a checkpoint against a different world would silently blend
    two different images; the fingerprint in the npz meta makes that a
    loud error. The runtime camera (``scene.cam``) is excluded — it is
    checkpointed and restored as data instead (a moved camera must resume
    *as moved*, not invalidate the checkpoint).
    """
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(scene._replace(cam=None)):
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:16]


class RenderSession:
    """Progressive accumulation over frames of ``samples_per_frame`` samples."""

    def __init__(
        self,
        world: api.World,
        config: RenderConfig = RenderConfig(),
        renderer_factory=None,
    ):
        self.world = world
        self.config = config
        self.width, self.height = config.resolve_size()
        # Morton-sort large scenes so the Pallas kernel's chunk culling has
        # spatial locality (affects only equal-t tie-breaking; see
        # scene/compile.py). Sessions on the jnp oracle build the flat
        # skip-link BVH for large meshes (the path the Pallas SMEM-cap
        # fallback relies on; the kernel has its own Morton-AABB gates
        # and ignores it). "auto" resolves like dispatch.resolve_backend
        # (kept inline: dispatch imports this module).
        resolved = config.backend
        if renderer_factory is None:
            # The default factory IS the jnp integrator, whatever the
            # platform: recording "pallas" here would let a later pallas
            # resume silently blend a jnp-produced stream (the exact
            # cross-compiler mixing load_checkpoint exists to refuse).
            resolved = "jnp"
        elif resolved == "auto":
            resolved = "pallas" if jax.default_backend() == "tpu" else "jnp"
        # Checkpoint provenance: cross-compiler images agree only
        # statistically (kernels/trace.py determinism contract), so a
        # resume must stay on the backend that produced the stream.
        self.backend_resolved = resolved
        self.scene = compile_scene(
            world,
            spatial_sort=len(world.spheres) > 64 or world.triangle_count > 64,
            triangle_bvh=(
                resolved == "jnp" and world.triangle_count > 512
            ),
        )
        if not world.camera.reference_mode:
            # Pre-populate the packed runtime-camera operand so the jitted
            # pytree structure never changes: the first set_camera() is
            # then an operand swap, not a recompile. Bit-identical to the
            # baked camera (same f32 basis, same expression order).
            from myraytracer_tpu.render.camera import pack_camera

            self.scene = self.scene._replace(
                cam=jnp.asarray(
                    pack_camera(world.camera, self.width, self.height)
                )
            )
        self.key = crng.key_from_seed(config.seed)

        factory = renderer_factory or make_renderer
        materials = {s.material.type_id for s in world.spheres}
        materials |= {m.material.type_id for m in world.meshes}
        # Scene-uniform dielectric IOR → static kernel constant (exact).
        iors = {s.material.ior for s in world.spheres if s.material.type_id == 3}
        iors |= {m.material.ior for m in world.meshes if m.material.type_id == 3}
        self.frame_batch = config.resolve_frame_batch(resolved)
        if self.frame_batch > 1 and config.shard not in ("none", "tiles"):
            # Tile-sharded chips keep contiguous sample windows across
            # frame buckets; sample/hybrid shards do not
            # (parallel/sharding.py).
            raise ValueError("frame_batch > 1 requires shard 'none' or 'tiles'")
        render_kwargs = dict(
            t_min=config.t_min,
            t_max=config.t_max,
            sample_batch=config.resolve_sample_batch(),
            material_set=tuple(sorted(materials)) or None,
            static_ior=(iors.pop() if len(iors) == 1 else None),
            sky=world.ambient,
            texture_set=world.texture_set or None,
            **({"frames": self.frame_batch} if self.frame_batch > 1 else {}),
            **(
                {"nee_lights": _extract_lights(world)}
                if config.nee else {}
            ),
            **({"qmc": True} if config.qmc else {}),
            **({"rr": config.rr} if config.rr else {}),
        )
        self._render = factory(
            world.camera,
            self.width,
            self.height,
            config.samples_per_frame,
            config.ray_depth,
            **render_kwargs,
        )
        # Cold-start mitigation (utils/cache.py): unsharded Pallas sessions
        # on real TPUs route through a serialized jax.export artifact —
        # warm starts skip Python tracing/lowering entirely and the XLA
        # compile hits the persistent cache. The exported module's compiled
        # arithmetic can differ from plain jit's at the ulp level, so the
        # execution path is checkpoint provenance (like backend/qmc) and a
        # session uses one path for its whole life.
        self.exec_path = "jit"
        import os as _os

        if (
            self.backend_resolved == "pallas"
            and config.shard == "none"
            and renderer_factory is not None
            and jax.default_backend() == "tpu"
            and _os.environ.get("MYRT_EXPORT_CACHE", "1") != "0"
        ):
            from myraytracer_tpu.utils import cache as _cache

            if _cache.cache_root() is not None:
                _cache.enable_persistent_cache()
                self._render, used_export = _cache.export_cached_renderer(
                    self._render,
                    (self.scene, self.key, jnp.uint32(0)),
                    key_parts=(
                        repr(world.camera),
                        self.width,
                        self.height,
                        config.samples_per_frame,
                        config.ray_depth,
                        repr(sorted(render_kwargs.items())),
                    ),
                )
                if used_export:
                    self.exec_path = "export"

        self.framebuffer = jnp.zeros((self.height, self.width, 3), jnp.float32)
        self.frame_count = 0  # lib.rs:232 sample_count
        self.sample_cursor = 0  # global sample index (per pixel)
        # Per-step device scalars queue here unforced (forcing per step
        # would block the host every frame and defeat dispatch pipelining,
        # cli.py viewer mode) and fold into a host float64 total at sync
        # points — an f32 running sum would lose precision over very long
        # sessions.
        self._segs_total = 0.0
        self._segs_pending = []
        self._fingerprint = None  # computed lazily (host sync)

    @property
    def segments_traced(self) -> float:
        """Total ray segments traced (forces pending device work)."""
        if self._segs_pending:
            pending, self._segs_pending = self._segs_pending, []
            # One batched transfer: each float(scalar) is a full host
            # round trip over the remote tunnel, and viewer-mode syncing
            # can queue dozens of pending step scalars.
            self._segs_total += float(
                np.asarray(
                    jax.device_get(jnp.stack(pending)), dtype=np.float64
                ).sum()
            )
        return self._segs_total

    @property
    def accumulated_spp(self) -> int:
        return self.frame_count * self.config.samples_per_frame

    def step(self) -> jnp.ndarray:
        """Render one step and blend it in; returns the new framebuffer.

        One step is ``frame_batch`` progressive frames (default 1): the
        batched call produces per-frame images and the blend chain applies
        the exact per-frame weights, so the framebuffer is bitwise the one
        K single-frame steps would produce.
        """
        next_cursor = (
            self.sample_cursor
            + self.config.samples_per_frame * self.frame_batch
        )
        # QMC reserves the top two draw words for its per-pixel scrambles
        # (core/rng.py QMC_SCRAMBLE_SLOTS).
        cap = 0xFFFFFFFF - (crng.QMC_SCRAMBLE_SLOTS if self.config.qmc else 0)
        if next_cursor * crng.DRAWS_PER_SAMPLE > cap:
            # The threefry draw index is sample_id * DRAWS_PER_SAMPLE +
            # slot in uint32: past ~16.9M samples/pixel it would wrap and
            # silently reuse the earliest samples' draws. Loud, per the
            # determinism contract (a run-forever session takes days to
            # get here).
            raise RuntimeError(
                f"sample cursor {next_cursor} would overflow the uint32 "
                f"draw-index space ({0xFFFFFFFF // crng.DRAWS_PER_SAMPLE} "
                f"samples/pixel max): the RNG stream would alias"
            )
        img, segs = self._render(
            self.scene, self.key, jnp.uint32(self.sample_cursor)
        )
        # Weight for blending each frame is derived from the count of
        # previously completed frames (0 for the first frame, lib.rs:424).
        # Both batch sizes route through the same jitted blend chain so the
        # compiled arithmetic (FMA contraction included) is identical —
        # frame batching stays bitwise-equal to single stepping.
        cap = self.config.max_framebuffer_weight
        ws = jnp.asarray(
            [
                min(cap, n / (n + 1)) if n else 0.0
                for n in range(
                    self.frame_count, self.frame_count + self.frame_batch
                )
            ],
            jnp.float32,
        )
        if self.frame_batch == 1:
            img = jnp.transpose(img, (2, 0, 1))[None]
        self.framebuffer = _blend_chain(self.framebuffer, img, ws)
        self.frame_count += self.frame_batch
        self.sample_cursor += self.config.samples_per_frame * self.frame_batch
        self._segs_pending.append(segs)  # lazy: no host sync here
        return self.framebuffer

    def run(self, frames: int) -> jnp.ndarray:
        """Run at least ``frames`` progressive frames (rounded up to a
        multiple of ``frame_batch``); ``frames <= 0`` is a no-op."""
        fb = self.framebuffer
        for _ in range(max(0, -(-frames // self.frame_batch))):
            fb = self.step()
        fb.block_until_ready()
        return self.framebuffer

    def set_camera(self, cam: api.Camera) -> None:
        """Move the camera without recompiling.

        Packs the new thin-lens basis into ``scene.cam`` (the kernel's
        runtime camera operand — render/camera.pack_camera) and resets the
        accumulation state: progressive blending assumes a fixed view, so
        a camera move starts a fresh frame stream (the sample stream
        continues from the cursor — no draws are reused). The reference
        cannot move its camera at all (shader.wgsl:360-361); here it is a
        ~µs host-side repack on an already-compiled kernel.
        """
        if cam.reference_mode or self.world.camera.reference_mode:
            # Both the new camera AND the one the renderer was built with
            # must be general-mode: renderers compiled for the reference
            # camera ignore scene.cam entirely (the move would silently
            # no-op while resetting accumulation).
            raise ValueError(
                "the reference-mode camera is fixed by contract; "
                "use a general (lookfrom/lookat) camera scene to move"
            )
        from myraytracer_tpu.render.camera import pack_camera

        self.scene = self.scene._replace(
            cam=jnp.asarray(pack_camera(cam, self.width, self.height))
        )
        self.framebuffer = jnp.zeros_like(self.framebuffer)
        self.frame_count = 0

    # -- checkpoint / resume --------------------------------------------------

    @property
    def scene_fingerprint(self) -> str:
        """Content hash of the compiled scene (cached; excludes camera)."""
        if self._fingerprint is None:
            fp = scene_fingerprint(self.scene)
            if self.world.ambient is not None:
                # The background color changes the image but lives outside
                # the compiled arrays (a static kernel constant) — fold it
                # into the provenance hash so mismatched resumes stay loud.
                import hashlib

                h = hashlib.sha256(fp.encode())
                h.update(repr(self.world.ambient).encode())
                fp = h.hexdigest()[:16]
            self._fingerprint = fp
        return self._fingerprint

    def save_checkpoint(self, path) -> None:
        """Save accumulation state to ``path`` (npz).

        ``path=None`` participates in the state gather without writing a
        file — under ``--multihost`` the framebuffer fetch is a collective
        every process must join, while only process 0 owns the file.
        """
        meta = {
            "version": CHECKPOINT_VERSION,
            "width": self.width,
            "height": self.height,
            "samples_per_frame": self.config.samples_per_frame,
            "ray_depth": self.config.ray_depth,
            "max_framebuffer_weight": self.config.max_framebuffer_weight,
            "seed": self.config.seed,
            "t_min": self.config.t_min,
            "t_max": self.config.t_max,
            "nee": self.config.nee,
            # NEE estimator generation: "mis" = balance-heuristic MIS
            # between the shadow ray and BSDF pickup (render/lights.py).
            # Pre-MIS NEE checkpoints lack the key and refuse to resume —
            # same draws, different weights, different image.
            "nee_estimator": "mis" if self.config.nee else None,
            "qmc": self.config.qmc,
            "rr": self.config.rr,
            # Exact-continuation provenance: the scene content, the compute
            # path that produced the stream, and the sharding mode.
            "scene": self.scene_fingerprint,
            "backend": self.backend_resolved,
            "shard": self.config.shard,
            "exec": self.exec_path,
        }
        # fetch_array, not np.asarray: under --multihost the framebuffer is
        # a process-spanning global array (shard_map tile sharding) and a
        # plain host read of non-addressable shards raises; the fetch
        # assembles it with an allgather (parallel/sharding.py).
        from myraytracer_tpu.parallel.sharding import fetch_array

        arrays = dict(
            framebuffer=fetch_array(self.framebuffer),
            frame_count=np.int64(self.frame_count),
            sample_cursor=np.int64(self.sample_cursor),
            segments_traced=np.float64(self.segments_traced),
            meta=json.dumps(meta),
        )
        if self.scene.cam is not None:
            # The runtime camera (set_camera / interactive orbit) is part
            # of the accumulation state: resuming under a different view
            # would silently blend two different images.
            arrays["camera"] = np.asarray(self.scene.cam)
        if path is not None:
            np.savez(pathlib.Path(path), **arrays)

    def load_checkpoint(self, path) -> None:
        data = np.load(pathlib.Path(path), allow_pickle=False)
        meta = json.loads(str(data["meta"]))
        if meta["version"] != CHECKPOINT_VERSION:
            raise ValueError(f"checkpoint version {meta['version']} unsupported")
        if meta.get("adaptive"):
            raise ValueError(
                "adaptive checkpoint: resume it with an AdaptiveSession "
                "(render/adaptive.py), not the uniform session"
            )
        for field in (
            "width", "height", "samples_per_frame", "ray_depth", "seed",
            "max_framebuffer_weight", "t_min", "t_max", "nee",
        ):
            have = getattr(self, field, None)
            if have is None:
                have = getattr(self.config, field)
            if meta[field] != have:
                raise ValueError(
                    f"checkpoint {field}={meta[field]} != session {have}"
                )
        if self.config.nee and meta.get("nee_estimator") != "mis":
            raise ValueError(
                f"checkpoint nee_estimator={meta.get('nee_estimator')!r} != "
                f"session 'mis': the MIS-weighted NEE image differs from "
                f"the pre-MIS stream (render/lights.py)"
            )
        if int(meta.get("rr", 0)) != self.config.rr:
            raise ValueError(
                f"checkpoint rr={meta.get('rr', 0)} != session "
                f"{self.config.rr}: different termination streams"
            )
        # Stream provenance added after v-1 checkpoints existed: absent
        # means the default estimator (False), not "unknown".
        if bool(meta.get("qmc", False)) != self.config.qmc:
            raise ValueError(
                f"checkpoint qmc={meta.get('qmc', False)} != session "
                f"{self.config.qmc}: different sample streams"
            )
        if meta["scene"] != self.scene_fingerprint:
            raise ValueError(
                f"checkpoint scene fingerprint {meta['scene']} != session "
                f"{self.scene_fingerprint}: refusing to blend frames from "
                f"a different world"
            )
        if meta["backend"] != self.backend_resolved:
            raise ValueError(
                f"checkpoint backend={meta['backend']} != session "
                f"{self.backend_resolved}: cross-compiler streams agree "
                f"only statistically (see kernels/trace.py), so an exact "
                f"resume must stay on the producing backend"
            )
        if meta["shard"] != self.config.shard:
            raise ValueError(
                f"checkpoint shard={meta['shard']} != session "
                f"{self.config.shard}"
            )
        # Execution-path provenance (added with the export cache; absent in
        # older checkpoints means plain jit): the exported module's compiled
        # arithmetic can differ from direct jit's at the ulp level, so an
        # exact resume stays on the producing path. MYRT_EXPORT_CACHE=0
        # forces plain jit when an old checkpoint must be continued.
        if meta.get("exec", "jit") != self.exec_path:
            raise ValueError(
                f"checkpoint exec={meta.get('exec', 'jit')} != session "
                f"{self.exec_path}: the export-cached and plain-jit "
                f"compiled modules agree only statistically"
            )
        if "camera" in data:
            if self.scene.cam is None:
                raise ValueError(
                    "checkpoint carries a runtime camera but this session "
                    "was built for the fixed reference camera"
                )
            self.scene = self.scene._replace(cam=jnp.asarray(data["camera"]))
        elif self.scene.cam is not None:
            # Symmetric refusal: a reference-camera checkpoint resumed
            # into a general-camera session would silently blend two
            # different views (the fingerprint excludes cameras).
            raise ValueError(
                "checkpoint has no runtime camera (fixed reference view) "
                "but this session renders a positionable camera"
            )
        self.framebuffer = jnp.asarray(data["framebuffer"])
        self.frame_count = int(data["frame_count"])
        self.sample_cursor = int(data["sample_cursor"])
        self._segs_total = float(data["segments_traced"])
        self._segs_pending = []


def render(
    world: api.World,
    config: RenderConfig = RenderConfig(),
    frames: int = 1,
    renderer_factory=None,
) -> np.ndarray:
    """One-shot convenience: run a session for ``frames`` frames."""
    session = RenderSession(world, config, renderer_factory=renderer_factory)
    return np.asarray(session.run(frames))
