"""First-class native CPU render backend (``--backend cpu``).

Round 3 measured the honest verdict for BASELINE config 5: triangle
meshes past ~25k triangles (and ~40k-sphere fields) are CPU territory —
a binned-SAH BVH on a multi-core CPU beats the TPU kernel's per-tile
conservative gating by 7-25× (BENCH.md "Config 5 vs a real CPU-BVH
baseline"). The winning implementation already shipped in-tree as the
benchmark baseline (``native/src/cpu_renderer.cpp``); this module
promotes it to a session backend so ``--backend cpu`` (and, on the
measured crossovers, ``--backend auto``) actually routes those scenes to
the fastest path the framework has.

The C++ side renders one frame of ``spp`` samples per call
(``mrt_cpu_render``): scene loaded once from the same binary dump the
baseline harness uses (``meshdump.py`` — identical scene bytes as the
TPU path), per-ROW splitmix64-seeded mt19937 streams (deterministic and
thread-count invariant), and an optional packed [19]-f32 runtime camera
(the session's ``scene.cam`` operand) so interactive orbits work without
reloading. The sample stream is mt19937, NOT the threefry stream the
jnp/pallas backends share — images agree statistically, never bitwise —
so ``backend="cpu"`` is checkpoint provenance exactly like the
jnp/pallas split (render/session.py refuses cross-backend resumes).

Scope: sphere, mesh, and MIXED worlds (one shared material table — the
"MRTMIX01" dump), checker/marble procedural textures (evaluated C-side
with the same hash-noise formulas as core/noise.py), general
(lookfrom/lookat) cameras, the default estimator (no NEE/QMC/RR — those
streams live on the TPU paths), no image textures, no sharding.
Everything else raises loudly or, under ``backend=auto``, simply keeps
the TPU path.
"""

from __future__ import annotations

import ctypes
import logging
import math
import os
import tempfile
from typing import Optional

import numpy as np

from myraytracer_tpu.native import _LIB_PATH, build_native
from myraytracer_tpu.scene import api

log = logging.getLogger("myraytracer_tpu.native.cpu")

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Load libmrt_native.so with the cpu-render symbols, rebuilding a
    stale library (pre-round-4 .so without mrt_cpu_render) once."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not _LIB_PATH.exists() and not build_native():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        if not hasattr(lib, "mrt_cpu_render"):
            # Stale build: rebuild and dlopen the new inode.
            if not build_native():
                _lib_failed = True
                return None
            lib = ctypes.CDLL(str(_LIB_PATH))
            if not hasattr(lib, "mrt_cpu_render"):
                _lib_failed = True
                return None
    except OSError:
        _lib_failed = True
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.mrt_cpu_scene_load.restype = ctypes.c_void_p
    lib.mrt_cpu_scene_load.argtypes = [ctypes.c_char_p]
    lib.mrt_cpu_scene_free.restype = None
    lib.mrt_cpu_scene_free.argtypes = [ctypes.c_void_p]
    lib.mrt_cpu_scene_info.restype = None
    lib.mrt_cpu_scene_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mrt_cpu_render.restype = ctypes.c_int
    lib.mrt_cpu_render.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_float, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_int, f32p,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def cpu_available() -> bool:
    return _load() is not None


def cpu_threads() -> int:
    """Worker threads for the native renderer: ``MYRT_CPU_THREADS`` env
    override, else every core the host has (0 → hardware_concurrency
    C-side)."""
    env = os.environ.get("MYRT_CPU_THREADS", "").strip()
    if env:
        return max(1, int(env))
    return 0


def cpu_ineligibility(world: api.World, config) -> Optional[str]:
    """Why ``world``/``config`` cannot render on the native CPU backend
    (None = eligible). The reasons mirror the backend's scope contract
    (module docstring); ``--backend cpu`` raises them, ``auto`` treats
    any reason as "stay on the TPU path"."""
    if not world.spheres and not world.meshes:
        return "empty world"
    if api.TEXTURE_IMAGE in world.texture_set:
        return "image textures (no C-side bitmap sampler; jnp serves them)"
    if world.camera.reference_mode:
        return "the fixed reference-mode camera (general cameras only)"
    if config.nee:
        return "--nee (the MIS shadow-ray estimator is TPU-path only)"
    if config.qmc:
        return "--qmc (the Owen-Sobol camera stream is TPU-path only)"
    if config.rr:
        return "--rr (Russian roulette is TPU-path only)"
    if config.shard != "none":
        return f"--shard {config.shard} (the CPU backend is single-host)"
    if config.frame_batch > 1:
        return "--frame-batch > 1 (a Pallas-kernel window optimization)"
    if not cpu_available():
        return "libmrt_native.so unavailable (no C++ toolchain?)"
    return None


# -- Measured throughput models (BENCH.md, round 3) ---------------------------
#
# Per-core CPU-BVH and TPU-kernel Mrays/s vs primitive count, log-log
# interpolated between measured anchors (clamped at the ends). CPU points:
# "CPU comparison" + "Config 5 vs a real CPU-BVH baseline"; TPU points:
# the same tables' kernel column (spp-8 per-synced for meshes — conservative
# in the TPU's favor at the small end, where streaming reaches 61).
# The 102k CPU point is extrapolated from the 1.96→1.8 trend.
_CPU_MESH = [(414, 5.90), (1614, 2.47), (6414, 2.20), (25614, 1.96), (102414, 1.80)]
_TPU_MESH = [(414, 61.0), (1614, 11.5), (6414, 6.92), (25614, 2.38), (102414, 1.15)]
_CPU_SPH = [(488, 4.29), (40000, 2.73)]
_TPU_SPH = [(488, 145.0), (40000, 4.60)]


def _model(points, n: int) -> float:
    xs = np.log([p[0] for p in points])
    ys = np.log([p[1] for p in points])
    return float(math.exp(np.interp(math.log(max(n, 1)), xs, ys)))


def route_prediction(world: api.World, config) -> Optional[tuple]:
    """Model-predicted ``(cpu_total, tpu)`` throughput in Mrays/s for an
    eligible world past the routing threshold, else None.

    ``cpu_total`` = host cores (``MYRT_CPU_THREADS`` override, else
    ``os.cpu_count()``) × the measured per-core CPU-BVH model; ``tpu``
    the measured TPU-kernel model (BENCH.md anchors). Mixed worlds
    combine the single-kind models harmonically — per-ray costs add
    (each backend traverses both structures per segment):
    ``1/tp = 1/tp_mesh(n_tris) + 1/tp_sph(n_sph)``.
    """
    if cpu_ineligibility(world, config) is not None:
        return None
    n_tris = world.triangle_count
    n_sph = len(world.spheres)
    if max(n_tris, n_sph) < 1024:
        return None
    cores = cpu_threads() or (os.cpu_count() or 1)
    # A kind with only a handful of primitives adds negligible per-ray
    # cost on either backend — charging it the models' smallest-anchor
    # rate (the log-log interp clamps at 414 tris / 488 spheres) would
    # bias a "big mesh + one ground sphere" world ~30% slow. Include a
    # kind's term only past the sweep-relevance threshold.
    FEW = 64
    cpu_terms, tpu_terms = [], []
    if world.meshes and n_tris >= FEW:
        cpu_terms.append(1.0 / _model(_CPU_MESH, n_tris))
        tpu_terms.append(1.0 / _model(_TPU_MESH, n_tris))
    if world.spheres and n_sph >= FEW:
        cpu_terms.append(1.0 / _model(_CPU_SPH, n_sph))
        tpu_terms.append(1.0 / _model(_TPU_SPH, n_sph))
    if not cpu_terms:  # unreachable past the >=1024 gate, but total
        return None
    return cores / sum(cpu_terms), 1.0 / sum(tpu_terms)


def auto_route(world: api.World, config, device_backend: str) -> Optional[str]:
    """``backend=auto`` routing: "cpu" when the native CPU path is
    predicted to out-render the TPU kernel on this host, else None.

    Prediction: :func:`route_prediction`. Only engages on TPU hosts for
    eligible worlds past 1k primitives — below that the TPU wins at every
    measured core count, and non-TPU sessions keep the documented
    auto→jnp contract (tests force the CPU platform).
    """
    if device_backend != "tpu":
        return None
    pred = route_prediction(world, config)
    if pred is None:
        return None
    cpu_total, tpu_tp = pred
    if cpu_total > tpu_tp:
        cores = cpu_threads() or (os.cpu_count() or 1)
        log.info(
            "auto backend routes to cpu: %d prims, predicted %.1f Mrays/s "
            "on %d cores vs %.1f on the TPU kernel (BENCH.md models)",
            world.triangle_count + len(world.spheres), cpu_total, cores,
            tpu_tp,
        )
        return "cpu"
    return None


# -- Renderer factory (RenderSession contract) --------------------------------


class _CpuScene:
    """Owns the native scene handle for a renderer's lifetime."""

    def __init__(self, world: api.World):
        from myraytracer_tpu.native import meshdump

        lib = _load()
        if lib is None:
            raise RuntimeError("libmrt_native.so unavailable")
        fd, path = tempfile.mkstemp(suffix=".mrtscene")
        os.close(fd)
        try:
            # Universal "MRTMIX01" dump: spheres + meshes + checker/
            # marble rows in one file (round 5 — mixed worlds were the
            # routing hole the old single-kind formats forced).
            meshdump.dump_scene(world, path)
            self._handle = lib.mrt_cpu_scene_load(path.encode())
        finally:
            os.unlink(path)
        if not self._handle:
            raise RuntimeError("native CPU scene load failed")
        self._lib = lib

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.mrt_cpu_scene_free(handle)
            self._handle = None


def make_cpu_factory(world: api.World):
    """Renderer factory over ``world`` with the session factory signature
    ``factory(cam, width, height, spp, depth, **render_kwargs)``.

    The returned renderer is ``fn(scene, key, sample_start) -> (img,
    segs)`` like the jnp/pallas factories: ``img`` a [H, W, 3] f32 linear
    per-pixel mean, ``segs`` the traced segment count. ``scene`` supplies
    only the packed runtime camera operand (``scene.cam``) — geometry was
    dumped at factory-build time, which is exactly the compile-time/
    operand split the TPU factories have.
    """
    if not world.spheres and not world.meshes:
        raise ValueError("backend cpu does not support empty worlds")
    if api.TEXTURE_IMAGE in world.texture_set:
        raise ValueError(
            "backend cpu has no bitmap sampler; render image-textured "
            "scenes on the jnp backend"
        )

    def factory(
        cam,
        width: int,
        height: int,
        samples_per_frame: int,
        ray_depth: int,
        *,
        t_min: float = 1e-3,
        t_max: float = 1e4,
        sample_batch: int = 0,
        material_set=None,
        static_ior=None,
        sky=None,
        texture_set=None,
        **unsupported,
    ):
        # TPU-path knobs; texture_set too — the dump carries the texture
        # rows itself (checker/marble C-side; images rejected above).
        del sample_batch, material_set, static_ior, sky, texture_set
        if unsupported:
            raise ValueError(
                f"backend cpu does not support {sorted(unsupported)} "
                f"(nee/qmc/rr/frame batching are TPU-path estimators)"
            )
        if cam.reference_mode:
            raise ValueError(
                "backend cpu needs a general (lookfrom/lookat) camera"
            )
        native_scene = _CpuScene(world)
        lib = native_scene._lib
        threads = cpu_threads()

        def render(scene, key, sample_start):
            seed64 = (int(key[0]) << 32) | int(key[1])
            # Distinct per-frame stream: fold the sample cursor in with an
            # odd-constant multiply (mix64 C-side finalizes per row).
            seed = (seed64 ^ (int(sample_start) * 0x9E3779B97F4A7C15)) & (
                (1 << 64) - 1
            )
            cam_ptr = None
            if getattr(scene, "cam", None) is not None:
                cam19 = np.ascontiguousarray(
                    np.asarray(scene.cam), np.float32
                )
                if cam19.shape != (19,):
                    raise ValueError(f"packed camera shape {cam19.shape}")
                cam_ptr = cam19.ctypes.data_as(ctypes.c_void_p)
            out = np.empty((height, width, 3), np.float32)
            segs = ctypes.c_double(0.0)
            rc = lib.mrt_cpu_render(
                native_scene._handle, width, height, samples_per_frame,
                ray_depth, seed, t_min, t_max, cam_ptr, threads, out,
                ctypes.byref(segs),
            )
            if rc != 0:
                raise RuntimeError(f"mrt_cpu_render failed (rc={rc})")
            return out, np.float32(segs.value)

        return render

    return factory
