"""Ray-sphere closest-hit tests against closed-form cases.

Mirrors the semantics of sphere_hit / world_hit (shader.wgsl:270-329).
"""

import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.render.hit import closest_hit
from myraytracer_tpu.scene import api
from myraytracer_tpu.scene.compile import compile_scene


def scene_of(*spheres):
    return compile_scene(api.World(spheres))


def rays(origins, dirs):
    o = np.asarray(origins, np.float32)
    d = np.asarray(dirs, np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    mk = lambda a: V3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))
    return mk(o), mk(d)


LAMB = api.Lambertian((0.5, 0.5, 0.5))


def test_basic_hit_t_and_normal():
    s = scene_of(api.Sphere((0, 0, -2), 0.5, LAMB))
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert bool(h.mask[0])
    np.testing.assert_allclose(float(h.t[0]), 1.5, rtol=1e-6)
    np.testing.assert_allclose(
        [float(h.normal.x[0]), float(h.normal.y[0]), float(h.normal.z[0])],
        [0, 0, 1],
        atol=1e-6,
    )
    assert bool(h.front_face[0])


def test_miss():
    s = scene_of(api.Sphere((0, 0, -2), 0.5, LAMB))
    o, d = rays([[0, 0, 0]], [[0, 1, 0]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert not bool(h.mask[0])


def test_inside_sphere_uses_far_root_and_flips_normal():
    # Origin inside the sphere: near root is negative → far root; the
    # outward normal at the exit points along the ray → flipped back.
    s = scene_of(api.Sphere((0, 0, 0), 1.0, LAMB))
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert bool(h.mask[0])
    np.testing.assert_allclose(float(h.t[0]), 1.0, rtol=1e-6)
    assert not bool(h.front_face[0])
    np.testing.assert_allclose(float(h.normal.z[0]), 1.0, atol=1e-6)


def test_t_min_window_excludes_near_hit():
    # Hit at t=1.5 excluded when t_min > 1.5 picks the far intersection.
    s = scene_of(api.Sphere((0, 0, -2), 0.5, LAMB))
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 2.0, 1e4)
    assert bool(h.mask[0])
    np.testing.assert_allclose(float(h.t[0]), 2.5, rtol=1e-6)


def test_t_max_window_excludes_far_hit():
    s = scene_of(api.Sphere((0, 0, -2), 0.5, LAMB))
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1.0)
    assert not bool(h.mask[0])


def test_closest_of_many():
    s = scene_of(
        api.Sphere((0, 0, -5), 0.5, LAMB),
        api.Sphere((0, 0, -2), 0.5, LAMB),
        api.Sphere((0, 0, -9), 0.5, LAMB),
    )
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert int(h.idx[0]) == 1
    np.testing.assert_allclose(float(h.t[0]), 1.5, rtol=1e-6)


def test_negative_radius_inward_normal():
    # Hollow-glass shell (shader.wgsl:299 semantics with signed radius):
    # geometric normal (at-center)/radius points INWARD for radius < 0, so
    # an entry hit reports front_face = False — which is exactly what makes
    # the dielectric treat the inner shell as a glass→air transition — and
    # the shading normal is flipped back to oppose the ray.
    s = scene_of(api.Sphere((0, 0, -2), -0.5, api.Dielectric(1.5)))
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert bool(h.mask[0])
    np.testing.assert_allclose(float(h.t[0]), 1.5, rtol=1e-6)
    assert not bool(h.front_face[0])
    np.testing.assert_allclose(float(h.normal.z[0]), 1.0, atol=1e-6)


def test_grazing_and_tangent():
    # Tangent ray: disc == 0 exactly is a hit (reference: d < 0 is the miss
    # branch, shader.wgsl:282); numerically we only require no crash and a
    # sane t if reported.
    s = scene_of(api.Sphere((0, 1, -2), 1.0, LAMB))
    o, d = rays([[0, 0, 0]], [[0, 0, -1]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    if bool(h.mask[0]):
        assert 1.0 < float(h.t[0]) < 3.0


def test_many_lanes_and_chunking():
    # Force the chunked-scan path with > chunk spheres and multiple lanes.
    spheres = [
        api.Sphere((x, 0.0, -3.0), 0.4, LAMB) for x in np.linspace(-8, 8, 40)
    ]
    s = compile_scene(api.World(spheres))
    n = 64
    xs = np.linspace(-8, 8, n)
    o, d = rays(
        [[x, 0, 0] for x in xs],
        [[0, 0, -1]] * n,
    )
    h = closest_hit(o, d, s, 1e-3, 1e4)
    hits = np.asarray(h.mask)
    # Rays near sphere columns hit; t ≈ 2.6 for centered rays.
    assert hits.sum() > n // 2
    t = np.asarray(h.t)[hits]
    assert (t > 2.5).all() and (t < 3.01).all()


def test_pad_slots_never_hit():
    # A single real sphere, many pad slots; rays that miss the real sphere
    # must miss everything.
    s = scene_of(api.Sphere((0, 0, -2), 0.1, LAMB))
    assert s.padded_size == 8
    o, d = rays([[0, 5, 0]], [[0, 1, 0]])
    h = closest_hit(o, d, s, 1e-3, 1e4)
    assert not bool(h.mask[0])
