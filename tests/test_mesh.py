"""Triangle meshes: Möller-Trumbore hit, compile, end-to-end render."""

import pytest

import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.render.hit import closest_hit
from myraytracer_tpu.scene import api, meshgen, presets
from myraytracer_tpu.scene.api import Lambertian, Mesh, Sphere
from myraytracer_tpu.scene.compile import compile_scene


def rays(origins, dirs):
    o = np.asarray(origins, np.float32)
    d = np.asarray(dirs, np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    mk = lambda a: V3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))
    return mk(o), mk(d)


LAMB = Lambertian((0.5, 0.5, 0.5))


def tri_world(*meshes, spheres=()):
    return api.World(spheres, camera=api.Camera.reference(), meshes=meshes)


@pytest.mark.slow
def test_single_triangle_hit():
    m = Mesh([(0, 0, -2), (1, 0, -2), (0, 1, -2)], [(0, 1, 2)], LAMB)
    s = compile_scene(tri_world(m))
    o, d = rays([[0.2, 0.2, 0], [5, 5, 0]], [[0, 0, -1], [0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert bool(h.mask[0]) and not bool(h.mask[1])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-6)
    # CCW winding (0,1,2) has geometric normal +z; ray travels -z → front.
    assert bool(h.front_face[0])
    np.testing.assert_allclose(float(h.normal.z[0]), 1.0, atol=1e-6)


def test_triangle_two_sided():
    m = Mesh([(0, 0, -2), (1, 0, -2), (0, 1, -2)], [(0, 1, 2)], LAMB)
    s = compile_scene(tri_world(m))
    o, d = rays([[0.2, 0.2, -4]], [[0, 0, 1]])  # hit from behind
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert bool(h.mask[0])
    # Backface: front_face False (sphere convention, shader.wgsl:303-307),
    # shading normal flipped to oppose the ray.
    assert not bool(h.front_face[0])
    np.testing.assert_allclose(float(h.normal.z[0]), -1.0, atol=1e-6)


def test_triangle_edge_window():
    m = Mesh([(0, 0, -2), (1, 0, -2), (0, 1, -2)], [(0, 1, 2)], LAMB)
    s = compile_scene(tri_world(m))
    # barycentric outside (u+v > 1) misses.
    o, d = rays([[0.9, 0.9, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert not bool(h.mask[0])
    # t-window excludes.
    o, d = rays([[0.2, 0.2, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1.5)
    assert not bool(h.mask[0])


def test_sphere_triangle_mix_closest_wins():
    m = Mesh([(-1, -1, -3), (1, -1, -3), (0, 1, -3)], [(0, 1, 2)], LAMB)
    sph = Sphere((0, 0, -2), 0.5, api.Metal((0.8, 0.8, 0.8)))
    s = compile_scene(tri_world(m, spheres=(sph,)))
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert bool(h.mask[0])
    np.testing.assert_allclose(float(h.t[0]), 1.5, rtol=1e-6)  # sphere first
    assert int(h.mat_ty[0]) == api.MATERIAL_METAL
    # Behind the sphere, the triangle wins.
    o, d = rays([[0.9, -0.9, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert bool(h.mask[0])
    np.testing.assert_allclose(float(h.t[0]), 3.0, rtol=1e-6)
    assert int(h.mat_ty[0]) == api.MATERIAL_LAMBERTIAN


def test_meshgen_icosphere_on_sphere():
    v, f = meshgen.icosphere((1.0, 2.0, 3.0), 0.5, 1)
    assert f.shape == (80, 3)
    r = np.linalg.norm(v - np.array([1.0, 2.0, 3.0]), axis=1)
    np.testing.assert_allclose(r, 0.5, rtol=1e-6)


def test_mesh_scene_renders():
    from myraytracer_tpu.render.integrator import make_renderer

    world = presets.mesh_scene(subdivisions=1)
    assert world.triangle_count > 100
    scene = compile_scene(world)
    render = make_renderer(world.camera, 16, 8, 2, 4, sample_batch=2)
    from myraytracer_tpu.core import rng as crng

    img, segs = render(scene, crng.key_from_seed(0), 0)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.max() > 0.05
    assert float(segs) > 16 * 8 * 2  # some rays bounced


@pytest.mark.slow
def test_bvh_traversal_matches_brute_force():
    """Skip-link BVH traversal returns the same hits as the linear scan."""
    from myraytracer_tpu.scene.compile import compile_scene as cs

    world = presets.mesh_scene(subdivisions=2)
    brute = cs(world, triangle_bvh=False)
    accel = cs(world, triangle_bvh=True)
    assert accel.tris.bvh is not None

    rng_ = np.random.RandomState(0)
    n = 256
    origins = rng_.uniform(-3, 3, (n, 3)) + [0, 1, 1]
    dirs = rng_.standard_normal((n, 3))
    o, d = rays(origins, dirs)
    hb = closest_hit(o, d, brute, 1e-3, 1e4)
    ha = closest_hit(o, d, accel, 1e-3, 1e4)
    np.testing.assert_array_equal(np.asarray(hb.mask), np.asarray(ha.mask))
    np.testing.assert_allclose(
        np.asarray(hb.t), np.asarray(ha.t), rtol=1e-6, atol=1e-6
    )
    # Same winning surface (materials/normals), though indices may differ
    # under reordering.
    np.testing.assert_array_equal(
        np.asarray(hb.mat_ty), np.asarray(ha.mat_ty)
    )
    np.testing.assert_allclose(
        np.asarray(hb.normal.x), np.asarray(ha.normal.x), atol=1e-5
    )


def test_bvh_scene_renders():
    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.render.integrator import make_renderer
    from myraytracer_tpu.scene.compile import compile_scene as cs

    world = presets.mesh_scene(subdivisions=2)
    scene = cs(world, triangle_bvh=True)
    render = make_renderer(world.camera, 16, 8, 1, 4, sample_batch=1)
    img, segs = render(scene, crng.key_from_seed(0), 0)
    assert np.isfinite(np.asarray(img)).all()
    assert float(segs) > 0


@pytest.mark.slow
def test_mesh_sphere_equivalence():
    """A fine icosphere mesh converges to the analytic sphere silhouette."""
    from myraytracer_tpu.render.hit import closest_hit as ch

    v, f = meshgen.icosphere((0, 0, -2), 0.5, 3)
    mesh_scene = compile_scene(tri_world(Mesh(v, f, LAMB)))
    sph_scene = compile_scene(
        api.World([Sphere((0, 0, -2), 0.5, LAMB)])
    )
    n = 32
    xs = np.linspace(-0.4, 0.4, n)
    o, d = rays([[x, 0, 0] for x in xs], [[0, 0, -1]] * n)
    hm = ch(o, d, mesh_scene, 1e-3, 1e4)
    hs = ch(o, d, sph_scene, 1e-3, 1e4)
    assert (np.asarray(hm.mask) == np.asarray(hs.mask)).all()
    np.testing.assert_allclose(
        np.asarray(hm.t), np.asarray(hs.t), rtol=0, atol=0.01
    )


def test_rotate_y_preserves_shape_and_distances():
    import numpy as np

    from myraytracer_tpu.scene import meshgen

    v, _ = meshgen.box((10.0, 5.0, -2.0), (1.0, 2.0, 3.0))
    r = meshgen.rotate_y(v, 37.0)
    # Rigid rotation about the centroid: centroid and pairwise distances
    # are preserved, y untouched.
    np.testing.assert_allclose(r.mean(axis=0), v.mean(axis=0), atol=1e-4)
    np.testing.assert_array_equal(r[:, 1], v[:, 1])
    d_v = np.linalg.norm(v[:, None] - v[None, :], axis=-1)
    d_r = np.linalg.norm(r[:, None] - r[None, :], axis=-1)
    np.testing.assert_allclose(d_r, d_v, rtol=1e-5, atol=1e-4)
    # 360 degrees is identity.
    np.testing.assert_allclose(meshgen.rotate_y(v, 360.0), v, atol=2e-3)
