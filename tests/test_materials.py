"""Material scatter contracts (shader.wgsl:198-252 + RTiOW dielectric)."""

import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.render.hit import Hit
from myraytracer_tpu.render.materials import color_sky, scatter
from myraytracer_tpu.scene import api


def mk_hit(normal, mat_ty, albedo=(0.5, 0.5, 0.5), fuzz=0.0, ior=1.5, front=True, n=1):
    shp = (n,)
    f = lambda v: jnp.full(shp, v, jnp.float32)
    return Hit(
        t=f(1.0),
        idx=jnp.zeros(shp, jnp.int32),
        mask=jnp.ones(shp, bool),
        point=V3(f(0.0), f(0.0), f(-1.0)),
        normal=V3(f(normal[0]), f(normal[1]), f(normal[2])),
        front_face=jnp.full(shp, front, bool),
        mat_ty=jnp.full(shp, mat_ty, jnp.int32),
        albedo=V3(f(albedo[0]), f(albedo[1]), f(albedo[2])),
        fuzz=f(fuzz),
        ior=f(ior),
    )


def unit(x, y, z, n=1):
    v = np.array([x, y, z], np.float32)
    v /= np.linalg.norm(v)
    f = lambda c: jnp.full((n,), c, jnp.float32)
    return V3(f(v[0]), f(v[1]), f(v[2]))


def zero3(n=1):
    return V3.zeros((n,))


def test_lambertian_direction_and_albedo():
    hit = mk_hit((0, 1, 0), api.MATERIAL_LAMBERTIAN, albedo=(0.7, 0.3, 0.3))
    sph = unit(1, 0, 0)  # pretend unit-sphere draw
    sc = scatter(unit(0, -1, 0), hit, sph, zero3(), jnp.zeros((1,)))
    assert bool(sc.ok[0])
    np.testing.assert_allclose(
        [float(sc.direction.x[0]), float(sc.direction.y[0]), float(sc.direction.z[0])],
        [1.0, 1.0, 0.0],
        atol=1e-6,
    )
    np.testing.assert_allclose(float(sc.attenuation.x[0]), 0.7, rtol=1e-6)


def test_lambertian_degenerate_falls_back_to_normal():
    # unit-sphere draw exactly opposite the normal → zero direction → normal
    # (shader.wgsl:209-211).
    hit = mk_hit((0, 1, 0), api.MATERIAL_LAMBERTIAN)
    sph = unit(0, -1, 0)
    sc = scatter(unit(0, -1, 0), hit, sph, zero3(), jnp.zeros((1,)))
    assert bool(sc.ok[0])
    np.testing.assert_allclose(float(sc.direction.y[0]), 1.0, atol=1e-6)


def test_metal_reflects():
    hit = mk_hit((0, 1, 0), api.MATERIAL_METAL, albedo=(0.8, 0.8, 0.8))
    d = unit(1, -1, 0)
    sc = scatter(d, hit, zero3(), zero3(), jnp.zeros((1,)))
    assert bool(sc.ok[0])
    want = np.array([1, 1, 0]) / np.sqrt(2)
    np.testing.assert_allclose(
        [float(sc.direction.x[0]), float(sc.direction.y[0]), float(sc.direction.z[0])],
        want,
        atol=1e-6,
    )


def test_metal_absorption_rule():
    # Fuzz pushes the reflected ray below the surface → absorbed
    # (shader.wgsl:234-236): reflected is (1,1,0)/√2, fuzz*ball = (0,-2,0)
    # makes dot(dir, n) < 0.
    hit = mk_hit((0, 1, 0), api.MATERIAL_METAL, fuzz=2.0)
    d = unit(1, -1, 0)
    ball = unit(0, -1, 0)  # length-1 "ball" draw
    sc = scatter(d, hit, zero3(), ball, jnp.zeros((1,)))
    assert not bool(sc.ok[0])


def test_dielectric_refracts_snell():
    # Air→glass at 45°: sin(theta_t) = sin(45°)/1.5.
    hit = mk_hit((0, 1, 0), api.MATERIAL_DIELECTRIC, ior=1.5, front=True)
    d = unit(1, -1, 0)
    # u_reflect = 1.0 → never Schlick-reflect (reflectance > 1 impossible).
    sc = scatter(d, hit, zero3(), zero3(), jnp.ones((1,)))
    assert bool(sc.ok[0])
    out = np.array(
        [float(sc.direction.x[0]), float(sc.direction.y[0]), float(sc.direction.z[0])]
    )
    out /= np.linalg.norm(out)
    sin_t = abs(out[0])
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)
    assert out[1] < 0  # transmitted into the surface
    np.testing.assert_allclose(float(sc.attenuation.y[0]), 1.0)


def test_dielectric_total_internal_reflection():
    # Glass→air beyond the critical angle (~41.8°): must reflect.
    hit = mk_hit((0, 1, 0), api.MATERIAL_DIELECTRIC, ior=1.5, front=False)
    d = unit(1, -0.5, 0)  # ~63° from normal
    sc = scatter(d, hit, zero3(), zero3(), jnp.ones((1,)))
    assert bool(sc.ok[0])
    # Reflected: y component flips.
    assert float(sc.direction.y[0]) > 0


def test_dielectric_schlick_reflect_draw():
    # Head-on air→glass: r0 = ((1-2/3)/(1+2/3))^2 = 0.04; u < 0.04 reflects.
    hit = mk_hit((0, 1, 0), api.MATERIAL_DIELECTRIC, ior=1.5, front=True)
    d = unit(0, -1, 0)
    sc_reflect = scatter(d, hit, zero3(), zero3(), jnp.full((1,), 0.01))
    assert float(sc_reflect.direction.y[0]) > 0  # reflected back up
    sc_refract = scatter(d, hit, zero3(), zero3(), jnp.full((1,), 0.99))
    assert float(sc_refract.direction.y[0]) < 0  # transmitted


def test_unknown_material_absorbs():
    hit = mk_hit((0, 1, 0), api.MATERIAL_NONE)
    sc = scatter(unit(0, -1, 0), hit, zero3(), zero3(), jnp.zeros((1,)))
    assert not bool(sc.ok[0])


def test_sky_gradient_values():
    # shader.wgsl:331-334: white at y=-1, (0.5,0.7,1.0) at y=+1.
    for y, want in [(-1.0, (1, 1, 1)), (1.0, (0.5, 0.7, 1.0)), (0.0, (0.75, 0.85, 1.0))]:
        c = color_sky(jnp.float32(y))
        np.testing.assert_allclose(
            [float(c.x), float(c.y), float(c.z)], want, rtol=1e-6
        )
