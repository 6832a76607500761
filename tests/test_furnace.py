"""Closed-form furnace tests for the whole estimator family.

Golden images pin *stability*, not *correctness*: an energy-conservation
bug older than the goldens would be golden-blessed today. These tests
pin correctness against values derivable on paper (VERDICT r04 item 5).

The key construction: a SINGLE CONVEX sphere under a constant ambient
background L. A scatter ray leaving a convex surface with
``dot(d, n) > 0`` can never re-intersect the body, so every camera ray
is analytically a two-segment path:

* miss        → exactly ``L``;
* Lambertian  → one attenuation then sky: exactly ``albedo * L``,
  **independent of the scattered direction** — zero variance, so the
  assertion is exact arithmetic, not statistics (any hemisphere leak,
  double attenuation, or mis-normalized scatter shifts it);
* Metal fuzz 0 → ``dot(reflect(d,n), n) = -dot(d,n) >= 0``: never
  absorbed, exactly ``albedo * L``;
* Dielectric  → no absorption at any bounce and every escape sees L:
  exactly ``L`` up to the depth cap (the internal-bounce tail carries
  Fresnel^k ≈ 0 energy at the test depth).

The hollow-enclosure degenerate (negative radius = inward normals,
camera at the center) adds the termination contract: no ray ever
escapes, radiance is exactly 0 and every camera ray traces exactly
``depth`` segments.

Estimators: the default stream, QMC (Owen-Sobol camera draws), and NEE
(with a zero-emit light hidden inside the sphere: direct term 0,
occluded shadow rays, unreachable by any path — the MIS machinery must
leave the furnace value untouched) all produce the EXACT closed form
per sample. Russian roulette is stochastic (terminate-or-compensate),
so its assertion is a confidence interval around the same value.

Reference anchor: the bounce-loop attenuation product this validates,
/root/reference/raytracer/src/shader.wgsl:336-358.
"""

import numpy as np
import pytest

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.render.dispatch import make_session
from myraytracer_tpu.scene.api import (
    Camera,
    Dielectric,
    DiffuseLight,
    Lambertian,
    Metal,
    Sphere,
    World,
)

L = (0.6, 0.8, 1.0)  # constant ambient (the furnace's uniform source)
CAM = Camera(
    lookfrom=(0.0, 0.0, 4.0),
    lookat=(0.0, 0.0, 0.0),
    vup=(0.0, 1.0, 0.0),
    vfov_degrees=40.0,
    aperture=0.0,
)


def _world(material, hidden_light=False):
    spheres = [Sphere((0.0, 0.0, 0.0), 1.0, material)]
    if hidden_light:
        # Inside the unit sphere: occluded from every shading point,
        # unreachable by any path; emit 0 — NEE's light set is nonempty
        # but analytically inert.
        spheres.append(
            Sphere((0.0, 0.0, 0.0), 0.1, DiffuseLight((0.0, 0.0, 0.0)))
        )
    return World(spheres=spheres, camera=CAM, ambient=L)


def _render(world, backend="jnp", spp=4, depth=8, **cfg):
    config = RenderConfig(
        width=32, height=24, samples_per_frame=spp, ray_depth=depth,
        backend=backend, **cfg,
    )
    s = make_session(world, config)
    img = np.asarray(s.step())
    return img, s


def _assert_two_level(img, hit_value, spp, tol=1e-4):
    """Every SAMPLE is exactly sky L or exactly ``hit_value``, so every
    pixel is the mixture ``sky + λ·(hit - sky)`` with ``λ = k/spp``
    for an integer k (silhouette pixels mix the two closed forms via
    sub-pixel jitter). Assert (a) zero residual off the mixture line,
    (b) λ ∈ [0, 1], (c) λ·spp integral, (d) the sphere is visible."""
    sky = np.asarray(L, np.float32)
    hv = np.asarray(hit_value, np.float32)
    diff = hv - sky
    lam = ((img - sky) @ diff) / float(diff @ diff)
    resid = img - (sky + lam[..., None] * diff)
    assert np.abs(resid).max() < tol, (
        f"off-mixture residual {np.abs(resid).max():.2e}"
    )
    assert lam.min() > -tol and lam.max() < 1 + tol, (lam.min(), lam.max())
    k = lam * spp
    assert np.abs(k - np.round(k)).max() < spp * tol, (
        "non-integral sample mixture"
    )
    assert (lam > 0.5).any(), "no pixel shows the sphere"


def test_furnace_lambertian_exact():
    a = (0.7, 0.5, 0.3)
    img, _ = _render(_world(Lambertian(a)))
    _assert_two_level(img, np.asarray(a) * np.asarray(L), spp=4)


def test_furnace_lambertian_exact_pallas_interpret():
    """The megakernel satisfies the same closed form (interpret mode)."""
    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.kernels.trace import make_renderer
    from myraytracer_tpu.scene.compile import compile_scene

    a = (0.7, 0.5, 0.3)
    world = _world(Lambertian(a))
    scene = compile_scene(world)
    render = make_renderer(
        world.camera, 16, 8, 2, 6, tile_rows=8, interpret=True,
        sky=world.ambient,
    )
    img, _segs = render(scene, crng.key_from_seed(0), 0)
    _assert_two_level(
        np.asarray(img), np.asarray(a) * np.asarray(L), spp=2
    )


def test_furnace_metal_fuzz0_exact():
    m = (0.9, 0.8, 0.6)
    img, _ = _render(_world(Metal(m, fuzz=0.0)))
    _assert_two_level(img, np.asarray(m) * np.asarray(L), spp=4)


def test_furnace_dielectric_conserves_energy():
    # Glass absorbs nothing and every escaped path sees the constant L,
    # so the ENTIRE image equals L minus only the depth-capped internal
    # tail (TIR chains carry ~Fresnel^k energy). Any absorption or
    # Fresnel-normalization bug shows up orders of magnitude larger.
    img, _ = _render(_world(Dielectric(1.5)), spp=16, depth=32)
    sky = np.asarray(L, np.float32)
    ratio = img / sky
    assert ratio.max() < 1.0 + 1e-4  # never creates energy
    assert ratio.min() > 0.98, ratio.min()  # loses only the capped tail
    assert (1.0 - ratio.mean()) < 0.005


def test_furnace_qmc_exact():
    a = (0.7, 0.5, 0.3)
    img, _ = _render(_world(Lambertian(a)), qmc=True)
    _assert_two_level(img, np.asarray(a) * np.asarray(L), spp=4)


def test_furnace_nee_exact():
    # The hidden zero-emit light makes the NEE/MIS machinery run on
    # every diffuse bounce while contributing exactly nothing.
    a = (0.7, 0.5, 0.3)
    img, _ = _render(_world(Lambertian(a), hidden_light=True), nee=True)
    _assert_two_level(img, np.asarray(a) * np.asarray(L), spp=4)


def test_furnace_rr_unbiased_within_ci():
    """Russian roulette terminates stochastically with 1/p compensation.
    RR decisions ride a DERIVED key (core/rng.py RR_KEY_FOLD) that
    consumes no main-stream slots, so the rr render's conditional
    expectation given the (identical) camera/scatter draws is exactly
    the no-rr render — assert the paired difference is zero within a
    computed 4-sigma CI."""
    a = 0.6
    spp = 64
    world = _world(Lambertian((a, a, a)))
    img_rr, _ = _render(world, spp=spp, depth=8, rr=1)
    img_ref, _ = _render(world, spp=spp, depth=8)
    diff = (img_rr - img_ref).reshape(-1)
    touched = np.abs(diff) > 0
    assert touched.any()  # RR actually fired
    sem = diff.std() / np.sqrt(diff.size)
    assert abs(diff.mean()) < 4.0 * sem + 1e-4, (diff.mean(), sem)


def test_enclosure_terminates_to_zero_with_exact_segments():
    """Camera at the center of a hollow (negative-radius) Lambertian
    enclosure: nothing escapes — radiance exactly 0, and the traced
    segment count is exactly width*height*spp*depth (no early leak, no
    over-trace)."""
    w, h, spp, depth = 16, 12, 2, 6
    world = World(
        spheres=[Sphere((0.0, 0.0, 4.0), -10.0, Lambertian((0.9, 0.9, 0.9)))],
        camera=CAM,
        ambient=L,
    )
    config = RenderConfig(
        width=w, height=h, samples_per_frame=spp, ray_depth=depth,
        backend="jnp",
    )
    s = make_session(world, config)
    img = np.asarray(s.step())
    np.testing.assert_array_equal(img, np.zeros_like(img))
    assert s.segments_traced == w * h * spp * depth
