"""Scene API + compiler tests (semantics of lib.rs:611-799)."""

import numpy as np

from myraytracer_tpu.scene import api, presets
from myraytracer_tpu.scene.compile import compile_reference_layout, compile_scene


def test_compile_reference_scene_soa():
    world = presets.reference_scene()
    s = compile_scene(world)
    assert s.padded_size % 8 == 0 and s.padded_size >= 4
    # First sphere: ground (lib.rs:689-695).
    assert float(s.center.y[0]) == -100.5
    assert float(s.radius[0]) == 100.0
    assert int(s.mat_ty[0]) == api.MATERIAL_LAMBERTIAN
    np.testing.assert_allclose(
        [float(s.albedo.x[0]), float(s.albedo.y[0]), float(s.albedo.z[0])],
        [0.8, 0.8, 0.0],
    )
    # Third sphere: left metal, fuzz 0.3 (lib.rs:704-710).
    assert int(s.mat_ty[2]) == api.MATERIAL_METAL
    assert abs(float(s.fuzz[2]) - 0.3) < 1e-7
    # Padding slots can never hit: radius_sq == -1.
    assert (np.asarray(s.radius_sq[4:]) == -1.0).all()
    # Padding radius is 1 (no div-by-zero in normal computation).
    assert (np.asarray(s.radius[4:]) == 1.0).all()


def test_compile_negative_radius_hollow_glass():
    world = presets.three_sphere_scene()
    s = compile_scene(world)
    radii = np.asarray(s.radius[: len(world.spheres)])
    assert (radii < 0).any()  # the hollow inner shell
    rsq = np.asarray(s.radius_sq[: len(world.spheres)])
    np.testing.assert_allclose(rsq, radii * radii, rtol=1e-6)


def test_reference_layout_parity():
    """The pool/range flattening mirrors Object::new (lib.rs:722-799)."""
    world = presets.reference_scene()
    raw = compile_reference_layout(world)
    w = raw["world"]

    # 4 spheres: 2 lambertian then 2 metal, insertion order.
    assert w["spheres"]["length"] == 4
    assert w["lambertians"]["length"] == 2
    assert w["metals"]["length"] == 2

    i32 = raw["i32_data"]
    ty_base = w["spheres"]["material_ty_base_idx"]
    idx_base = w["spheres"]["material_idx_base_idx"]
    # Types in sphere order: L, L, M, M (ids 1, 1, 2, 2 — lib.rs:644-648).
    assert list(i32[ty_base : ty_base + 4]) == [1, 1, 2, 2]
    # Per-pool indices restart per material type (lib.rs:735-748).
    assert list(i32[idx_base : idx_base + 4]) == [0, 1, 0, 1]

    # vec4 stream: sphere centers first, then lambertian albedos, then
    # metal albedos, all with w=1.0 (lib.rs:766-795).
    v4 = raw["vec4_f32_data"]
    assert w["spheres"]["center_base_idx"] == 0
    assert w["lambertians"]["albedo_base_idx"] == 4
    assert w["metals"]["albedo_base_idx"] == 6
    assert (v4[:, 3] == 1.0).all()
    np.testing.assert_allclose(v4[4], [0.8, 0.8, 0.0, 1.0])  # ground albedo
    # f32 stream: radii then fuzzes.
    f32 = raw["f32_data"]
    assert w["spheres"]["radius_base_idx"] == 0
    assert w["metals"]["fuzz_base_idx"] == 4
    np.testing.assert_allclose(f32[4:6], [0.3, 1.0])


def test_final_scene_generator_deterministic():
    w1 = presets.final_scene(seed=7)
    w2 = presets.final_scene(seed=7)
    assert len(w1) == len(w2)
    assert w1.spheres == w2.spheres
    # ~480 spheres: 1 ground + up to 484 grid + 3 big.
    assert 400 <= len(w1) <= 488
    assert w1.camera.vfov_degrees == 20.0
    assert w1.camera.aperture == 0.1
    # Different seeds differ.
    assert presets.final_scene(seed=8).spheres != w1.spheres


def test_sphere_field_generalizes_final_scene():
    # half_extent=11 must BE the final scene (identical RNG stream) —
    # golden images and examples depend on the exact sphere list.
    a = presets.final_scene(seed=0)
    b = presets.sphere_field(half_extent=11, seed=0)
    assert a.spheres == b.spheres
    assert a.camera == b.camera
    # spheres:N via get_scene; grid scales ~4N².
    small = presets.get_scene("spheres:3", seed=0)
    assert 20 <= len(small) <= 40
    big = presets.get_scene("spheres:20", seed=0)
    assert 1500 <= len(big) <= 1604


def test_camera_focus_dist():
    cam = api.Camera(lookfrom=(3.0, 0.0, 4.0), lookat=(0.0, 0.0, 0.0))
    assert abs(cam.resolved_focus_dist() - 5.0) < 1e-9
    cam2 = api.Camera(focus_dist=2.5)
    assert cam2.resolved_focus_dist() == 2.5


def test_material_params_must_be_nonnegative():
    # API contract (and the Pallas kernel packs the material-type index
    # into albedo/fuzz sign bits — a negative value would decode wrong).
    import pytest

    from myraytracer_tpu.scene import api

    with pytest.raises(ValueError):
        api.Lambertian(albedo=(-0.1, 0.5, 0.5))
    with pytest.raises(ValueError):
        api.Metal(albedo=(0.5, -1.0, 0.5))
    with pytest.raises(ValueError):
        api.Metal(albedo=(0.5, 0.5, 0.5), fuzz=-0.01)
    # Zero and positive values are fine.
    api.Lambertian(albedo=(0.0, 0.0, 0.0))
    api.Metal(albedo=(1.0, 1.0, 1.0), fuzz=0.0)


def test_diffuse_light_compiles_to_soa():
    """DiffuseLight: emission rides the albedo columns; type id 4."""
    import numpy as np

    from myraytracer_tpu.scene.api import (
        Camera, DiffuseLight, Sphere, World,
    )
    from myraytracer_tpu.scene.compile import compile_scene

    world = World(
        spheres=[Sphere((0.0, 0.0, -1.0), 0.5, DiffuseLight((4.0, 3.0, 2.0)))],
        camera=Camera.reference(),
    )
    scene = compile_scene(world)
    assert int(scene.mat_ty[0]) == 4
    np.testing.assert_allclose(
        [float(scene.albedo.x[0]),
         float(scene.albedo.y[0]),
         float(scene.albedo.z[0])],
        [4.0, 3.0, 2.0],
    )
    assert float(scene.fuzz[0]) == 0.0
    assert float(scene.ior[0]) == 1.0


def test_diffuse_light_rejects_negative_emit():
    import pytest

    from myraytracer_tpu.scene.api import DiffuseLight

    with pytest.raises(ValueError):
        DiffuseLight((-1.0, 0.0, 0.0))


def test_world_ambient_normalizes_to_float_tuple():
    from myraytracer_tpu.scene.api import Camera, World

    w = World(spheres=[], camera=Camera.reference(), ambient=(0, 0, 1))
    assert w.ambient == (0.0, 0.0, 1.0)
    assert all(isinstance(c, float) for c in w.ambient)
    assert World(spheres=[], camera=Camera.reference()).ambient is None


def test_kd_chunk_order_structure():
    """kd_chunk_order returns a permutation whose consecutive chunk-size
    groups have (weakly) tighter total AABB surface than the Morton
    grouping it replaces, and only the final group may be partial."""
    import numpy as np

    from myraytracer_tpu.scene import presets
    from myraytracer_tpu.scene.compile import kd_chunk_order, morton_order

    world = presets.final_scene(seed=0)
    # The kernel pipeline hoists the biggest spheres into the ungated
    # LEADERS prologue before grouping — mirror that: kd-group only the
    # small-sphere field (a giant outlier would otherwise legitimately
    # dominate any equal-count split).
    centers = np.asarray(
        [s.center for s in world.spheres if abs(s.radius) < 0.5], np.float32
    )
    chunk = 32
    perm = kd_chunk_order(centers, chunk)
    assert sorted(perm.tolist()) == list(range(len(centers)))

    def grouped_surface(order):
        total = 0.0
        for i in range(0, len(order), chunk):
            c = centers[order[i:i + chunk]]
            d = c.max(axis=0) - c.min(axis=0)
            total += 2.0 * (d[0] * d[1] + d[1] * d[2] + d[0] * d[2])
        return total

    assert grouped_surface(perm) <= grouped_surface(morton_order(centers))


def test_compile_scene_kd_partition_same_sphere_set():
    """partition='kd' reorders spheres only — the compiled multiset of
    (center, radius) rows is unchanged, and unknown names are rejected."""
    import numpy as np
    import pytest

    from myraytracer_tpu.scene import presets
    from myraytracer_tpu.scene.compile import compile_scene

    world = presets.final_scene(seed=0)
    a = compile_scene(world, spatial_sort=True, partition="morton")
    b = compile_scene(world, spatial_sort=True, partition="kd")

    def rows(sc):
        m = np.stack([
            np.asarray(sc.center.x), np.asarray(sc.center.y),
            np.asarray(sc.center.z), np.asarray(sc.radius),
        ], axis=-1)
        return sorted(map(tuple, m.tolist()))

    assert rows(a) == rows(b)
    # Leaders keep the front slots: every sphere bigger than the 0.2
    # field (the ground + the three unit spheres) sits in the first 8
    # (real) slots under both partitions; pads beyond n are excluded.
    n = len(world.spheres)
    assert (np.abs(np.asarray(b.radius))[8:n] < 0.5).all()
    assert (np.abs(np.asarray(b.radius))[:8] > 0.5).sum() == 4
    with pytest.raises(ValueError):
        compile_scene(world, spatial_sort=True, partition="sah")
