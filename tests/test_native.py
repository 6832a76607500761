"""Native C++ components (BVH builder, OBJ loader) and Python fallbacks."""

import numpy as np
import pytest

from myraytracer_tpu.native import FlatBVH, build_bvh, load_obj, native_available


def random_aabbs(n=200, seed=0):
    rng = np.random.RandomState(seed)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    r = rng.uniform(0.1, 0.5, (n, 1)).astype(np.float32)
    return c - r, c + r


def validate_bvh(bvh: FlatBVH, prim_min, prim_max):
    n = prim_min.shape[0]
    m = bvh.count.shape[0]
    assert sorted(bvh.order.tolist()) == list(range(n))
    # Leaves cover every primitive exactly once, in permutation order.
    covered = np.zeros(n, bool)
    for i in range(m):
        if bvh.count[i] > 0:
            ids = bvh.order[bvh.first[i] : bvh.first[i] + bvh.count[i]]
            assert not covered[ids].any()
            covered[ids] = True
            # Node bbox contains its primitives.
            assert (prim_min[ids] >= bvh.nodes_min[i] - 1e-4).all()
            assert (prim_max[ids] <= bvh.nodes_max[i] + 1e-4).all()
    assert covered.all()
    # Skip links: strictly increasing past the node, ending at m.
    assert (bvh.skip > np.arange(m)).all()
    assert (bvh.skip <= m).all()
    assert bvh.skip[0] == m


@pytest.mark.parametrize("force_python", [False, True])
def test_bvh_structure(force_python):
    mn, mx = random_aabbs()
    bvh = build_bvh(mn, mx, max_leaf=4, force_python=force_python)
    validate_bvh(bvh, mn, mx)
    # Leaf size respected.
    assert bvh.count.max() <= 4


def test_bvh_single_prim():
    mn, mx = random_aabbs(1)
    bvh = build_bvh(mn, mx, max_leaf=4)
    assert bvh.count.shape[0] == 1
    assert bvh.count[0] == 1


def test_native_lib_builds():
    # The toolchain is part of the environment; the native path must load.
    assert native_available()


def test_obj_loader_matches_python(tmp_path):
    p = tmp_path / "mesh.obj"
    p.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "f 1 2 3\n"
        "f 1/2/3 2//1 4 3\n"  # quad with index forms → 2 triangles
        "f -1 -2 -3\n"  # negative (relative) indices
    )
    v_n, t_n = load_obj(p)
    v_p, t_p = load_obj(p, force_python=True)
    np.testing.assert_array_equal(v_n, v_p)
    np.testing.assert_array_equal(t_n, t_p)
    assert v_n.shape == (4, 3)
    assert t_n.shape == (4, 3)  # 1 + 2 (fan) + 1


def test_obj_missing_file():
    with pytest.raises(FileNotFoundError):
        load_obj("/nonexistent/file.obj")


def test_obj_scene_end_to_end(tmp_path):
    """OBJ file → scene → a traced frame (CPU, tiny)."""
    from myraytracer_tpu.scene import meshgen
    from myraytracer_tpu.scene.presets import obj_scene
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.render.integrator import make_renderer
    from myraytracer_tpu.core import rng as crng

    v, f = meshgen.icosphere((0, 0, 0), 1.0, 0)
    p = tmp_path / "ico.obj"
    with open(p, "w") as fh:
        for pt in v:
            fh.write(f"v {pt[0]} {pt[1]} {pt[2]}\n")
        for t in f:
            fh.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")

    world = obj_scene(p)
    assert world.triangle_count == 20 + 2  # icosahedron + ground quad
    scene = compile_scene(world)
    render = make_renderer(world.camera, 16, 9, 1, 4, sample_batch=1)
    img, segs = render(scene, crng.key_from_seed(0), 0)
    assert np.isfinite(np.asarray(img)).all()
    assert float(segs) > 0


def test_obj_python_tolerates_malformed_tokens(tmp_path):
    """Fallback parity with the native loader's sscanf/strtol tolerance:
    a bad vertex line is skipped, a face index keeps its leading digits."""
    import numpy as np

    from myraytracer_tpu.native.obj_py import load_obj_python

    p = tmp_path / "m.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 x\nv 1 0 0\nv 0 1 0\nf 1 2 3a\n"
    )
    v, t = load_obj_python(p)
    assert v.shape == (3, 3)  # the malformed vertex was skipped
    np.testing.assert_array_equal(t, [[0, 1, 2]])  # '3a' -> 3


def _cpu_bench_bin():
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[1] / "native" / "mrt_cpu_bench"
    return p if p.exists() else None


def test_meshdump_roundtrip_and_cpu_bvh_render(tmp_path):
    """meshdump → native CPU-BVH mesh renderer → image statistically
    matching the jnp oracle on the identical scene bytes (the BASELINE
    config-5 comparison is only honest if both sides render the same
    world the same way)."""
    import json
    import subprocess

    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.native.meshdump import dump_world
    from myraytracer_tpu.output.image import read_ppm, to_u8
    from myraytracer_tpu.render.integrator import make_renderer
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import mesh_scene

    exe = _cpu_bench_bin()
    if exe is None:
        pytest.skip("native/mrt_cpu_bench not built (make -C native cpu)")

    world = mesh_scene(subdivisions=1)
    dump = tmp_path / "scene.bin"
    n = dump_world(world, dump)
    assert n == world.triangle_count

    w, h, spp, depth = 80, 45, 8, 8
    ppm = tmp_path / "cpu.ppm"
    out = subprocess.run(
        [str(exe), "--mesh", str(dump), str(w), str(h), str(spp), str(depth),
         "1", "--ppm", str(ppm)],
        capture_output=True, text=True, check=True, timeout=120,
    )
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["renderer"] == "cpu-bvh-mesh"
    assert stats["prims"] == n
    assert stats["segments"] > w * h * spp  # at least one bounce per ray

    scene = compile_scene(world, spatial_sort=True)
    render = make_renderer(world.camera, w, h, spp, depth, sample_batch=spp)
    img, segs = render(scene, crng.key_from_seed(0), 0)
    ours = to_u8(np.asarray(img), 2.0).astype(np.float64)
    cpu = read_ppm(ppm).astype(np.float64)
    # Same geometry, same estimator, different RNG streams: means agree
    # within sampling noise, and so do mean bounce counts.
    assert abs(ours.mean() - cpu.mean()) < 3.0, (ours.mean(), cpu.mean())
    tpu_bounces = float(segs) / (w * h * spp)
    cpu_bounces = stats["segments"] / (w * h * spp)
    assert abs(tpu_bounces - cpu_bounces) < 0.15, (tpu_bounces, cpu_bounces)


def test_meshdump_textured_albedo_exports_base_color(tmp_path):
    """Textured albedos export the base color scene/compile._base_color
    uses (Checker -> even, Marble -> color, ImageTexture -> white), not a
    silent white for every texture."""
    import struct

    from myraytracer_tpu.native.meshdump import _material_row
    from myraytracer_tpu.scene import api

    def albedo_of(mat):
        ty, r, g, b = struct.unpack("<i3f", _material_row(mat)[:16])
        return (round(r, 5), round(g, 5), round(b, 5))

    checker = api.Lambertian(api.Checker((0.2, 0.4, 0.6), (0.9, 0.9, 0.9)))
    assert albedo_of(checker) == (0.2, 0.4, 0.6)
    marble = api.Lambertian(api.Marble((0.3, 0.5, 0.7), 2.0))
    assert albedo_of(marble) == (0.3, 0.5, 0.7)
    img = api.Lambertian(
        api.ImageTexture(np.full((2, 2, 3), 0.5, np.float32))
    )
    assert albedo_of(img) == (1.0, 1.0, 1.0)
    solid = api.Lambertian((0.1, 0.2, 0.3))
    assert albedo_of(solid) == (0.1, 0.2, 0.3)


def test_meshdump_rejects_non_mesh_worlds(tmp_path):
    from myraytracer_tpu.native.meshdump import dump_world
    from myraytracer_tpu.scene.presets import final_scene, mesh_scene
    from myraytracer_tpu.scene.api import Camera, World

    with pytest.raises(ValueError, match="spheres"):
        dump_world(final_scene(), tmp_path / "x.bin")
    with pytest.raises(ValueError, match="no meshes"):
        dump_world(World(spheres=[]), tmp_path / "x.bin")
    w = mesh_scene(1)
    with pytest.raises(ValueError, match="camera"):
        dump_world(
            World(spheres=[], meshes=w.meshes, camera=Camera.reference()),
            tmp_path / "x.bin",
        )


def test_cpu_bench_sphere_bvh_matches_bruteforce(tmp_path):
    """`--bvh` must change throughput, not the image: identical RNG
    stream + identical closest hits → identical segment counts."""
    import json
    import subprocess

    exe = _cpu_bench_bin()
    if exe is None:
        pytest.skip("native/mrt_cpu_bench not built (make -C native cpu)")

    runs = {}
    for flag in ([], ["--bvh"]):
        out = subprocess.run(
            [str(exe), "64", "36", "2", "8", "1", *flag],
            capture_output=True, text=True, check=True, timeout=120,
        )
        stats = json.loads(out.stdout.strip().splitlines()[-1])
        runs[stats["renderer"]] = stats
    assert runs["cpu-bruteforce"]["segments"] == runs["cpu-bvh"]["segments"]


def test_spheredump_roundtrip_and_cpu_bvh_render(tmp_path):
    """dump_spheres → native CPU-BVH sphere renderer → image statistically
    matching the jnp oracle on the identical scene bytes (the
    sphere-scaling baseline surface, spheres:N)."""
    import json
    import subprocess

    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.native.meshdump import dump_spheres
    from myraytracer_tpu.output.image import read_ppm, to_u8
    from myraytracer_tpu.render.integrator import make_renderer
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import three_sphere_scene

    exe = _cpu_bench_bin()
    if exe is None:
        pytest.skip("native/mrt_cpu_bench not built (make -C native cpu)")

    # three-sphere: Lambertian + metal + HOLLOW glass (negative radius) —
    # exercises the signed-radius path in the C++ BVH bounds and normals.
    # The dump needs a general (positionable) camera.
    from myraytracer_tpu.scene.api import Camera

    world = three_sphere_scene(Camera(
        lookfrom=(0.0, 0.0, 0.5), lookat=(0.0, 0.0, -1.0),
        vup=(0.0, 1.0, 0.0), vfov_degrees=75.0,
    ))
    dump = tmp_path / "spheres.bin"
    n = dump_spheres(world, dump)
    assert n == len(world.spheres)

    w, h, spp, depth = 96, 54, 8, 10
    ppm = tmp_path / "cpu.ppm"
    out = subprocess.run(
        [str(exe), "--spheres", str(dump), str(w), str(h), str(spp),
         str(depth), "1", "--bvh", "--ppm", str(ppm)],
        capture_output=True, text=True, check=True, timeout=120,
    )
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["renderer"] == "cpu-bvh-spheres"
    assert stats["prims"] == n

    scene = compile_scene(world)
    render = make_renderer(world.camera, w, h, spp, depth, sample_batch=spp)
    img, segs = render(scene, crng.key_from_seed(0), 0)
    ours = to_u8(np.asarray(img), 2.0).astype(np.float64)
    cpu = read_ppm(ppm).astype(np.float64)
    assert abs(ours.mean() - cpu.mean()) < 4.0, (ours.mean(), cpu.mean())
    tpu_bounces = float(segs) / (w * h * spp)
    cpu_bounces = stats["segments"] / (w * h * spp)
    assert abs(tpu_bounces - cpu_bounces) < 0.25, (tpu_bounces, cpu_bounces)


def test_spheredump_rejects_mesh_and_reference_camera(tmp_path):
    from myraytracer_tpu.native.meshdump import dump_spheres
    from myraytracer_tpu.scene.presets import mesh_scene, reference_scene

    with pytest.raises(ValueError, match="meshes"):
        dump_spheres(mesh_scene(1), tmp_path / "x.bin")
    with pytest.raises(ValueError, match="camera"):
        dump_spheres(reference_scene(), tmp_path / "x.bin")


def test_obj_ground_sphere_cli(tmp_path):
    """--obj --ground: the mixed sphere+mesh world renders through the
    CLI (the round-5 routing-hole scene shape); --ground alone errors."""
    from myraytracer_tpu import cli
    from myraytracer_tpu.output.image import read_png
    from myraytracer_tpu.scene import meshgen

    v, f = meshgen.icosphere((0, 0, 0), 1.0, 1)
    p = tmp_path / "ico.obj"
    with open(p, "w") as fh:
        for x, y, z in v:
            fh.write(f"v {x} {y} {z}\n")
        for a, b, c in f:
            fh.write(f"f {a + 1} {b + 1} {c + 1}\n")

    out = tmp_path / "mix.png"
    rc = cli.main([
        "--width", "48", "--height", "32", "--samples-per-frame", "2",
        "--ray-depth", "4", "--frames", "1", "--backend", "jnp",
        "--obj", str(p), "--ground", "--out", str(out),
    ])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (32, 48, 3) and img.mean() > 10

    from myraytracer_tpu.scene.presets import obj_scene

    world = obj_scene(p, ground_sphere=True)
    assert world.spheres and world.meshes  # genuinely mixed

    with pytest.raises(SystemExit):
        cli.main(["--ground", "--out", str(out)])
