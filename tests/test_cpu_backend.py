"""Native CPU backend (``--backend cpu``) and its auto-routing.

Round 3's honest config-5 verdict: large meshes / 40k-sphere fields are
CPU territory (BENCH.md "Config 5 vs a real CPU-BVH baseline"). Round 4
promotes the in-tree C++ SAH-BVH renderer (native/src/cpu_renderer.cpp)
from bench baseline to a first-class backend; these tests pin the
session contract (statistical oracle parity, determinism, thread
invariance, provenance) and the measured-crossover routing decisions.
"""

import os

import numpy as np
import pytest

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.native import cpu_backend
from myraytracer_tpu.render import dispatch
from myraytracer_tpu.render.dispatch import make_session
from myraytracer_tpu.scene import presets

pytestmark = pytest.mark.skipif(
    not cpu_backend.cpu_available(),
    reason="libmrt_native.so unavailable (no C++ toolchain)",
)

CFG = RenderConfig(
    width=64, height=48, samples_per_frame=8, ray_depth=8, backend="cpu"
)


def test_cpu_mesh_statistical_parity_with_oracle():
    """Identical scene, camera, and estimator semantics: the mt19937
    stream differs from threefry, but per-image means and traced segment
    counts must agree closely (like tools/cpu_mesh_baseline.py's
    oracle validation)."""
    world = presets.mesh_scene(subdivisions=2)
    s_cpu = make_session(world, CFG)
    assert s_cpu.backend_resolved == "cpu"
    a = np.asarray(s_cpu.step())
    s_jnp = make_session(world, CFG.replace(backend="jnp"))
    b = np.asarray(s_jnp.step())
    assert np.isfinite(a).all()
    assert abs(float(a.mean()) - float(b.mean())) < 0.01
    assert abs(s_cpu.segments_traced - s_jnp.segments_traced) < (
        0.03 * s_jnp.segments_traced
    )


def test_cpu_sphere_statistical_parity_with_oracle():
    world = presets.get_scene("spheres:6")
    s_cpu = make_session(world, CFG)
    a = np.asarray(s_cpu.step())
    s_jnp = make_session(world, CFG.replace(backend="jnp"))
    b = np.asarray(s_jnp.step())
    assert abs(float(a.mean()) - float(b.mean())) < 0.01


def _mixed_world():
    """An OBJ-style mesh over a ground sphere + a glass sphere — the
    'most common real scene' shape the round-4 single-kind dump formats
    could not route (VERDICT r04 item 4)."""
    from myraytracer_tpu.scene.api import Dielectric, Lambertian, Sphere, World

    mesh = presets.mesh_scene(subdivisions=2)
    return World(
        spheres=[
            Sphere((0.0, -1000.0, 0.0), 1000.0,
                   Lambertian((0.5, 0.5, 0.5))),
            Sphere((1.1, 0.35, 0.4), 0.35, Dielectric(1.5)),
        ],
        meshes=mesh.meshes,
        camera=mesh.camera,
    )


def test_cpu_mixed_world_statistical_parity_with_oracle():
    """Mixed sphere+mesh worlds render on the native path (the MRTMIX01
    dump) and agree with the jnp oracle statistically — closing the
    round-4 eligibility hole."""
    world = _mixed_world()
    assert cpu_backend.cpu_ineligibility(world, CFG) is None
    s_cpu = make_session(world, CFG)
    assert s_cpu.backend_resolved == "cpu"
    a = np.asarray(s_cpu.step())
    s_jnp = make_session(world, CFG.replace(backend="jnp"))
    b = np.asarray(s_jnp.step())
    assert np.isfinite(a).all()
    assert abs(float(a.mean()) - float(b.mean())) < 0.01
    assert abs(s_cpu.segments_traced - s_jnp.segments_traced) < (
        0.03 * s_jnp.segments_traced
    )


def test_cpu_procedural_texture_parity_with_oracle():
    """Checker + marble shade C-side with the same hash-noise formulas
    as core/noise.py: per-CHANNEL means must agree with the oracle
    (channel-wise catches a wrong checker color where a luminance-only
    mean could cancel)."""
    world = presets.get_scene("texture")
    assert cpu_backend.cpu_ineligibility(world, CFG) is None
    s_cpu = make_session(world, CFG)
    assert s_cpu.backend_resolved == "cpu"
    a = np.asarray(s_cpu.step())
    s_jnp = make_session(world, CFG.replace(backend="jnp"))
    b = np.asarray(s_jnp.step())
    assert np.isfinite(a).all()
    for ch in range(3):
        assert abs(float(a[..., ch].mean()) - float(b[..., ch].mean())) < 0.015


def test_cpu_deterministic_and_thread_invariant(monkeypatch):
    """Per-row splitmix64 seeding: the image is a pure function of the
    seed — bitwise stable across runs AND across thread counts (the
    property checkpoint provenance relies on)."""
    world = presets.get_scene("spheres:6")
    monkeypatch.setenv("MYRT_CPU_THREADS", "1")
    a = np.asarray(make_session(world, CFG).step())
    monkeypatch.setenv("MYRT_CPU_THREADS", "4")
    b = np.asarray(make_session(world, CFG).step())
    np.testing.assert_array_equal(a, b)


def test_cpu_frame_stream_advances():
    """Frame 2 uses a distinct per-frame stream (the sample cursor folds
    into the seed): two steps must not blend identical images."""
    world = presets.get_scene("spheres:6")
    s = make_session(world, CFG)
    f1 = np.asarray(s.step())
    f2 = np.asarray(s.step())
    assert not np.array_equal(f1, f2)


def test_auto_route_measured_crossovers(monkeypatch):
    """The routing matrix from BENCH.md's measured models: large meshes
    and 40k-sphere fields route to cpu on multi-core TPU hosts; small
    scenes, 1-core hosts, non-TPU platforms, and TPU-only estimator
    flags stay on the TPU path."""
    mesh4 = presets.mesh_scene(subdivisions=4)  # 6.4k tris
    cfg = RenderConfig()
    monkeypatch.setenv("MYRT_CPU_THREADS", "32")
    assert cpu_backend.auto_route(mesh4, cfg, "tpu") == "cpu"
    assert cpu_backend.auto_route(
        presets.get_scene("spheres:100"), cfg, "tpu"
    ) == "cpu"
    # Small scenes: the TPU kernel wins at every measured core count.
    assert cpu_backend.auto_route(presets.reference_scene(), cfg, "tpu") is None
    assert cpu_backend.auto_route(presets.final_scene(), cfg, "tpu") is None
    # TPU-only estimators and platforms keep the documented contract.
    assert cpu_backend.auto_route(mesh4, cfg.replace(nee=True), "tpu") is None
    assert cpu_backend.auto_route(mesh4, cfg.replace(qmc=True), "tpu") is None
    assert cpu_backend.auto_route(mesh4, cfg.replace(rr=5), "tpu") is None
    assert cpu_backend.auto_route(
        mesh4, cfg.replace(shard="tiles"), "tpu"
    ) is None
    assert cpu_backend.auto_route(mesh4, cfg, "cpu") is None
    # Mixed 25k-tri mesh over a ground sphere (the round-4 routing
    # hole): routes to cpu via the harmonic combined model.
    from myraytracer_tpu.scene.api import Lambertian, Sphere, World

    mesh5 = presets.mesh_scene(subdivisions=5)
    mixed = World(
        spheres=[Sphere((0.0, -1000.0, 0.0), 1000.0,
                        Lambertian((0.5, 0.5, 0.5)))],
        meshes=mesh5.meshes,
        camera=mesh5.camera,
    )
    assert cpu_backend.auto_route(mixed, cfg, "tpu") == "cpu"
    # 1-core host: mesh:4 stays on the TPU (6.9 vs 2.2 Mrays/s).
    monkeypatch.setenv("MYRT_CPU_THREADS", "1")
    assert cpu_backend.auto_route(mesh4, cfg, "tpu") is None


def test_make_session_auto_routes_to_cpu(monkeypatch):
    """End-to-end: backend=auto on a (simulated) 32-core TPU host builds
    a cpu-backend session for mesh:4 and renders through the C++ path,
    with backend provenance recorded for checkpoints."""
    monkeypatch.setenv("MYRT_CPU_THREADS", "32")
    monkeypatch.setattr(dispatch, "_device_backend", lambda: "tpu")
    world = presets.mesh_scene(subdivisions=4)
    s = make_session(
        world,
        RenderConfig(width=32, height=24, samples_per_frame=2, ray_depth=4,
                     backend="auto"),
    )
    assert s.backend_resolved == "cpu"
    # The model's prediction rides on the session for the CLI's runtime
    # sanity check (cli._check_routing_prediction).
    assert getattr(s, "routing_prediction", 0) > 0
    fb = np.asarray(s.step())
    assert np.isfinite(fb).all() and fb.mean() > 0.0


def test_routing_prediction_runtime_check(caplog):
    """The one-shot steady-state check: a >3x model miss warns loudly; a
    hit logs at info; either way the check disarms after one reading
    (the first sync only arms it — warmup-polluted)."""
    import logging

    from myraytracer_tpu import cli

    class S:
        pass

    s = S()
    s.routing_prediction = 100.0
    with caplog.at_level(logging.WARNING, logger="myraytracer_tpu"):
        cli._check_routing_prediction(s, 1.0)  # arms only — no warning
        assert not caplog.records
        cli._check_routing_prediction(s, 1.0)  # 100x miss
    assert any("mispredicted" in r.message for r in caplog.records)
    assert s.routing_prediction is None
    caplog.clear()

    ok = S()
    ok.routing_prediction = 10.0
    with caplog.at_level(logging.INFO, logger="myraytracer_tpu"):
        cli._check_routing_prediction(ok, 5.0)
        cli._check_routing_prediction(ok, 5.0)  # within 3x
    assert any("holds" in r.message for r in caplog.records)
    assert ok.routing_prediction is None


def test_cpu_checkpoint_provenance(tmp_path):
    """A cpu-stream checkpoint refuses to resume on a TPU-path backend
    (different sample streams — like the jnp/pallas split)."""
    world = presets.get_scene("spheres:6")
    s = make_session(world, CFG)
    s.step()
    path = tmp_path / "cpu.npz"
    s.save_checkpoint(path)
    s2 = make_session(world, CFG)
    s2.load_checkpoint(path)  # same backend: fine
    assert s2.frame_count == 1
    s3 = make_session(world, CFG.replace(backend="jnp"))
    with pytest.raises(ValueError, match="backend"):
        s3.load_checkpoint(path)


def test_cpu_runtime_camera_orbit():
    """set_camera works on the cpu backend: the packed [19]-f32 operand
    is honored per frame (interactive orbits without scene reload)."""
    from myraytracer_tpu.scene import api

    world = presets.get_scene("spheres:6")
    s = make_session(world, CFG)
    a = np.asarray(s.step())
    cam = world.camera
    moved = api.Camera(
        lookfrom=(cam.lookfrom[0] + 3.0, cam.lookfrom[1], cam.lookfrom[2]),
        lookat=cam.lookat, vup=cam.vup, vfov_degrees=cam.vfov_degrees,
        aperture=cam.aperture, focus_dist=cam.focus_dist,
    )
    s.set_camera(moved)
    b = np.asarray(s.step())
    assert np.isfinite(b).all()
    assert not np.array_equal(a, b)


def test_cpu_rejects_unsupported_loudly():
    world = presets.get_scene("spheres:6")
    for bad, match in (
        (CFG.replace(nee=True), "nee"),
        (CFG.replace(qmc=True), "qmc"),
        (CFG.replace(rr=4), "rr"),
        (CFG.replace(shard="tiles"), "shard"),
        (CFG.replace(frame_batch=4), "frame"),
    ):
        with pytest.raises(ValueError, match=match):
            make_session(world, bad)
    with pytest.raises(ValueError, match="reference|camera"):
        make_session(presets.reference_scene(), CFG)
    # Procedural textures shade C-side since round 5; IMAGE textures
    # still reject (no C-side bitmap sampler).
    with pytest.raises(ValueError, match="image|bitmap"):
        make_session(presets.get_scene("earth"), CFG)
    from myraytracer_tpu.render.adaptive import AdaptiveSession

    with pytest.raises(ValueError, match="adaptive"):
        AdaptiveSession(world, CFG)


def test_cpu_cli_render(tmp_path, caplog):
    """--backend cpu through the CLI: per-frame logs + image output."""
    import logging

    from myraytracer_tpu import cli
    from myraytracer_tpu.output.image import read_png

    out = tmp_path / "cpu.png"
    with caplog.at_level(logging.INFO, logger="myraytracer_tpu"):
        rc = cli.main(
            ["--width", "32", "--height", "24", "--samples-per-frame", "2",
             "--ray-depth", "4", "--frames", "2", "--scene", "spheres:4",
             "--backend", "cpu", "--out", str(out)]
        )
    assert rc == 0
    assert any("frame=2" in r.message for r in caplog.records)
    img = read_png(out)
    assert img.shape == (24, 32, 3)


def test_mixed_prediction_ignores_trivial_kind():
    """A single ground sphere must not be charged the models' smallest-
    anchor per-ray cost: the mixed prediction with 1 sphere equals the
    pure-mesh prediction (the trivial kind's term is dropped)."""
    from myraytracer_tpu.scene.api import Lambertian, Sphere, World

    monkey_cores = os.environ.get("MYRT_CPU_THREADS")
    os.environ["MYRT_CPU_THREADS"] = "32"
    try:
        cfg = RenderConfig()
        mesh6 = presets.mesh_scene(subdivisions=6)
        mixed = World(
            spheres=[Sphere((0.0, -1000.0, 0.0), 1000.0,
                            Lambertian((0.5, 0.5, 0.5)))],
            meshes=mesh6.meshes,
            camera=mesh6.camera,
        )
        pm = cpu_backend.route_prediction(mesh6, cfg)
        px = cpu_backend.route_prediction(mixed, cfg)
        assert pm is not None and px is not None
        assert px == pm
    finally:
        if monkey_cores is None:
            os.environ.pop("MYRT_CPU_THREADS", None)
        else:
            os.environ["MYRT_CPU_THREADS"] = monkey_cores


def test_mix_loader_rejects_truncated_dump(tmp_path):
    """A MRTMIX01 file whose counts disagree with its byte length must
    fail cleanly (NULL handle), not abort out of a resize()."""
    import ctypes
    import struct

    from myraytracer_tpu.native import _LIB_PATH

    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.mrt_cpu_scene_load.restype = ctypes.c_void_p
    lib.mrt_cpu_scene_load.argtypes = [ctypes.c_char_p]

    bad = tmp_path / "bad.mrtscene"
    # Header claims 5 tris + huge sphere count; no payload follows.
    head = b"MRTMIX01" + struct.pack("<3i", 1, 5, 2**30)
    head += struct.pack("<12f", *([0.0] * 12)) + struct.pack(
        "<i3f", 0, 0.0, 0.0, 0.0
    )
    bad.write_bytes(head)
    assert lib.mrt_cpu_scene_load(str(bad).encode()) is None

    neg = tmp_path / "neg.mrtscene"
    head = b"MRTMIX01" + struct.pack("<3i", 1, 5, -1)
    head += struct.pack("<12f", *([0.0] * 12)) + struct.pack(
        "<i3f", 0, 0.0, 0.0, 0.0
    )
    neg.write_bytes(head)
    assert lib.mrt_cpu_scene_load(str(neg).encode()) is None
