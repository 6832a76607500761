"""Next-event estimation (render/lights.py): unbiasedness vs the
brute-force estimator, variance reduction, and wiring."""

import numpy as np
import pytest

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.render.integrator import make_renderer
from myraytracer_tpu.render.lights import extract_lights
from myraytracer_tpu.render.session import RenderSession
from myraytracer_tpu.scene import presets
from myraytracer_tpu.scene.compile import compile_scene

KEY = crng.key_from_seed(0)


def test_extract_lights_spheres_and_triangles():
    lights = extract_lights(presets.light_scene())
    assert len(lights) == 2 and all(k == "sphere" for k, *_ in lights)
    lights = extract_lights(presets.cornell_scene())
    assert len(lights) == 2 and all(k == "tri" for k, *_ in lights)
    assert extract_lights(presets.reference_scene()) == ()


@pytest.mark.parametrize("scene_name,depth", [("light", 8), ("cornell", 6)])
@pytest.mark.slow
def test_nee_matches_brute_force_statistically(scene_name, depth):
    """Same scene, two estimators: means agree within sampling noise
    (measured: residual |diff| matches the brute estimator's own
    seed-to-seed noise at this spp — BENCH.md NEE section)."""
    world = presets.get_scene(scene_name)
    scene = compile_scene(world)
    kw = dict(sky=world.ambient, sample_batch=4)
    brute = make_renderer(world.camera, 24, 16, 512, depth, **kw)
    a, _ = brute(scene, KEY, 0)
    nee = make_renderer(world.camera, 24, 16, 512, depth,
                        nee_lights=extract_lights(world), **kw)
    b, _ = nee(scene, KEY, 0)
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all() and (b >= 0).all()
    # Image means agree to a few percent at 512 spp...
    assert abs(b.mean() - a.mean()) < 0.06 * max(a.mean(), 1e-6)
    # ...and per-pixel residuals are noise-scale, not structure-scale.
    assert np.abs(b - a).mean() < 0.25 * a.mean()


def test_nee_reduces_variance_at_equal_spp():
    world = presets.light_scene()
    scene = compile_scene(world)
    kw = dict(sky=world.ambient, sample_batch=4)

    def seed_noise(lights):
        r = make_renderer(world.camera, 24, 16, 64, 8,
                          nee_lights=lights, **kw)
        i1, _ = r(scene, KEY, 0)
        i2, _ = r(scene, KEY, 100000)
        return np.abs(np.asarray(i1) - np.asarray(i2)).mean()

    brute = seed_noise(None)
    nee = seed_noise(extract_lights(world))
    # Measured ~2.9x on this scene; assert a conservative floor.
    assert nee < 0.6 * brute


def test_nee_counts_shadow_rays_as_segments():
    world = presets.light_scene()
    scene = compile_scene(world)
    kw = dict(sky=world.ambient, sample_batch=2)
    _, s_brute = make_renderer(world.camera, 16, 8, 8, 8, **kw)(
        scene, KEY, 0)
    _, s_nee = make_renderer(
        world.camera, 16, 8, 8, 8,
        nee_lights=extract_lights(world), **kw)(scene, KEY, 0)
    assert float(s_nee) > float(s_brute)


def test_nee_session_and_checkpoint_provenance(tmp_path):
    cfg = RenderConfig(width=16, height=8, samples_per_frame=2,
                       ray_depth=4, backend="jnp", nee=True)
    s = RenderSession(presets.light_scene(), cfg)
    s.step()
    assert np.asarray(s.framebuffer).max() > 0
    path = tmp_path / "nee.npz"
    s.save_checkpoint(path)
    other = RenderSession(presets.light_scene(), cfg.replace(nee=False))
    with pytest.raises(ValueError, match="nee"):
        other.load_checkpoint(path)


@pytest.mark.slow
@pytest.mark.parametrize("scene_name", ["light", "cornell"])
def test_nee_kernel_oracle_parity(scene_name):
    """The Pallas kernel's NEE (shadow sweep with per-lane t-limits)
    consumes the identical draws and occlusion predicate as the oracle —
    images match to f32 accumulation tolerance (interpret mode)."""
    from myraytracer_tpu.kernels.trace import (
        make_renderer as make_pallas_renderer,
    )

    world = presets.get_scene(scene_name)
    scene = compile_scene(world)
    mats = {s.material.type_id for s in world.spheres}
    mats |= {m.material.type_id for m in world.meshes}
    kw = dict(material_set=tuple(sorted(mats)), sky=world.ambient,
              nee_lights=extract_lights(world))
    jr = make_renderer(world.camera, 16, 8, 2, 4, sample_batch=2, **kw)
    pr = make_pallas_renderer(world.camera, 16, 8, 2, 4, tile_rows=8,
                              interpret=True, **kw)
    a, sa = jr(scene, KEY, 0)
    b, sb = pr(scene, KEY, 0)
    a, b = np.asarray(a), np.asarray(b)
    assert b.max() > 0.1  # lights illuminate through the kernel path
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert float(sa) == float(sb)  # shadow rays counted identically


def test_nee_noop_without_lights():
    """nee on a light-free scene is the identical estimator (empty light
    tuple disables the NEE block statically)."""
    world = presets.reference_scene()
    scene = compile_scene(world)
    base = make_renderer(world.camera, 16, 8, 2, 4, sample_batch=2)
    a, _ = base(scene, KEY, 0)
    nee = make_renderer(world.camera, 16, 8, 2, 4, sample_batch=2,
                        nee_lights=extract_lights(world))
    b, _ = nee(scene, KEY, 0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_nee_frame_batching_matches_single_calls():
    """NEE composes with multi-frame kernel calls: the prev-diffuse carry
    resets at regeneration. Tolerance is the cross-program FMA-contraction
    envelope (measured <= 1 ulp on <= 3 pixels; the non-NEE multiframe
    test stays bitwise), with segment counts exactly equal."""
    from myraytracer_tpu.kernels.trace import (
        make_renderer as make_pallas_renderer,
    )

    world = presets.light_scene()
    scene = compile_scene(world)
    kw = dict(material_set=(1, 2, 4), sky=world.ambient,
              nee_lights=extract_lights(world), tile_rows=8, interpret=True)
    single = make_pallas_renderer(world.camera, 16, 8, 2, 4, **kw)
    multi = make_pallas_renderer(world.camera, 16, 8, 2, 4, frames=3, **kw)
    imgs, segs_m = multi(scene, KEY, 0)
    segs_total = 0.0
    for f in range(3):
        want, segs = single(scene, KEY, f * 2)
        np.testing.assert_allclose(
            np.asarray(imgs[f]).transpose(1, 2, 0), np.asarray(want),
            rtol=1e-6, atol=1e-7,
        )
        segs_total += float(segs)
    assert float(segs_m) == segs_total


@pytest.mark.slow
def test_nee_tile_sharded_bitwise():
    from myraytracer_tpu.parallel.sharding import make_tile_sharded_renderer

    world = presets.light_scene()
    scene = compile_scene(world)
    kw = dict(sky=world.ambient, nee_lights=extract_lights(world),
              sample_batch=2)
    single = make_renderer(world.camera, 16, 12, 4, 4, **kw)
    want, _ = single(scene, KEY, 0)
    sharded = make_tile_sharded_renderer(world.camera, 16, 12, 4, 4, **kw)
    got, _ = sharded(scene, KEY, 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_nee_sphere_light_matches_analytic_irradiance():
    """Closed form: a Lambertian plane under a sphere light centered on
    the normal axis reflects radiance albedo * L_e * sin^2(theta_max)
    (E = L_e * pi * sin^2 = L_e * pi * r^2/d^2). depth=2 exercises the
    full MIS pair — the shadow ray's balance-weighted term plus the BSDF
    path's complementary pickup must sum to the closed form (the weights
    summing to one IS the MIS invariant); a pdf normalization error shows
    up as a systematic scale error, not noise."""
    from myraytracer_tpu.scene.api import (
        Camera, DiffuseLight, Lambertian, Sphere, World,
    )

    albedo, L_e, r, cy = 0.5, 10.0, 5.0, 50.0
    world = World(
        spheres=[
            Sphere((0.0, -1000.5, 0.0), 1000.0,
                   Lambertian((albedo,) * 3)),
            Sphere((0.0, cy, 0.0), r, DiffuseLight((L_e,) * 3)),
        ],
        camera=Camera(lookfrom=(0.0, 2.0, 0.0), lookat=(0.0, -0.5, 0.0),
                      vup=(0.0, 0.0, -1.0), vfov_degrees=2.0),
        ambient=(0.0, 0.0, 0.0),
    )
    scene = compile_scene(world)
    render = make_renderer(world.camera, 16, 8, 256, 2, sample_batch=8,
                           sky=world.ambient,
                           nee_lights=extract_lights(world))
    img, _ = render(scene, KEY, 0)
    img = np.asarray(img)
    d = cy + 0.5  # light center to the hit point directly below
    expected = albedo * L_e * (r * r) / (d * d)
    np.testing.assert_allclose(img.mean(), expected, rtol=0.02)
    # And uniformly so (a tiny-fov view of a flat lit plane).
    np.testing.assert_allclose(img, expected, rtol=0.08)


def test_nee_quad_light_matches_analytic_irradiance():
    """Triangle-light pdf check: a small quad light far overhead is a
    point source — E = L_e * A * cos_l * cos_s / d^2, reflected radiance
    albedo/pi * E (far-field error ~(size/d)^2 ~ 4e-4 here). depth=2 so
    the MIS-weighted shadow term and the BSDF pickup complement sum to
    the closed form."""
    import math

    from myraytracer_tpu.scene.api import (
        Camera, DiffuseLight, Lambertian, Mesh, Sphere, World,
    )
    from myraytracer_tpu.scene.meshgen import quad

    albedo, L_e, h = 0.5, 10.0, 50.0
    v, f = quad((-0.5, h, -0.5), (0.5, h, -0.5), (0.5, h, 0.5),
                (-0.5, h, 0.5))
    world = World(
        spheres=[Sphere((0.0, -1000.5, 0.0), 1000.0,
                        Lambertian((albedo,) * 3))],
        meshes=[Mesh(v, f, DiffuseLight((L_e,) * 3))],
        camera=Camera(lookfrom=(0.0, 2.0, 0.0), lookat=(0.0, -0.5, 0.0),
                      vup=(0.0, 0.0, -1.0), vfov_degrees=2.0),
        ambient=(0.0, 0.0, 0.0),
    )
    scene = compile_scene(world)
    render = make_renderer(world.camera, 16, 8, 512, 2, sample_batch=8,
                           sky=world.ambient,
                           nee_lights=extract_lights(world))
    img, _ = render(scene, KEY, 0)
    d = h + 0.5
    expected = albedo / math.pi * L_e * 1.0 / (d * d)
    np.testing.assert_allclose(np.asarray(img).mean(), expected, rtol=0.02)


def test_mis_contribution_bounded_and_pdf_sides_consistent():
    """The MIS invariants, directly on render/lights.py:

    1. the shadow-ray contribution is bounded by ``emit`` per channel for
       ANY geometry (the firefly-killer property unweighted NEE lacks);
    2. for every direction the sampler generates, light_pdf_at_hit
       re-derives the same density the sampler used — the two sides of
       the balance heuristic must agree or the weights don't sum to 1."""
    import math as m

    import jax.numpy as jnp

    from myraytracer_tpu.core.vec import V3
    from myraytracer_tpu.render.lights import light_pdf_at_hit, sample_lights
    from myraytracer_tpu.scene.api import DiffuseLight, Mesh, Sphere, World
    from myraytracer_tpu.scene.meshgen import quad

    emit = 7.0
    for world in (
        World(spheres=[Sphere((0.0, 3.0, 0.0), 1.0,
                              DiffuseLight((emit,) * 3))]),
        World(spheres=[], meshes=[Mesh(*quad(
            (-1.0, 3.0, -1.0), (1.0, 3.0, -1.0), (1.0, 3.0, 1.0),
            (-1.0, 3.0, 1.0)), DiffuseLight((emit,) * 3))]),
    ):
        lights = extract_lights(world)
        rng = np.random.RandomState(1)
        n_pts = 256
        # Shading points scattered around (and right under the edge of)
        # the light — the near-light/grazing regime.
        p = V3(*(jnp.asarray(rng.uniform(lo, hi, n_pts), jnp.float32)
                 for lo, hi in ((-2, 2), (0.0, 2.9), (-2, 2))))
        n = V3(jnp.zeros(n_pts), jnp.ones(n_pts), jnp.zeros(n_pts))
        u = [jnp.asarray(rng.uniform(0, 1, n_pts), jnp.float32)
             for _ in range(3)]
        omega, t_p, contrib, add = sample_lights(lights, p, n, u[0], u[1], u[2])
        add = np.asarray(add)
        assert add.any()
        c = np.asarray(contrib.x)[add]
        assert (c <= emit * (1 + 1e-5)).all(), c.max()  # bounded
        # Side 2: re-derive pi*q from the contribution and compare with
        # the pickup-side evaluation along the sampled ray.
        cos = np.asarray(omega.dot(n))[add]
        piq_sampler = emit * cos / np.maximum(c, 1e-12) - cos
        piq_eval = np.asarray(
            light_pdf_at_hit(lights, p, omega, t_p)
        )[add]
        np.testing.assert_allclose(
            piq_eval, piq_sampler, rtol=5e-3, atol=1e-4
        )
    del m


def test_mis_reduces_near_light_fireflies():
    """A diffuse floor touching a bright quad light: unweighted NEE's
    contribution explodes as 1/d^2 near the contact line (the Cornell
    firefly class); the MIS term is bounded by albedo*emit. Check the
    rendered max pixel respects the bound (+ indirect slack)."""
    from myraytracer_tpu.scene.api import (
        Camera, DiffuseLight, Lambertian, Mesh, Sphere, World,
    )
    from myraytracer_tpu.scene.meshgen import quad

    emit, albedo = 50.0, 0.7
    # Vertical light panel meeting the floor at x=0.
    v, f = quad((0.0, 0.0, -2.0), (0.0, 2.0, -2.0), (0.0, 2.0, 2.0),
                (0.0, 0.0, 2.0))
    world = World(
        spheres=[Sphere((0.0, -1000.0, 0.0), 1000.0,
                        Lambertian((albedo,) * 3))],
        meshes=[Mesh(v, f, DiffuseLight((emit,) * 3))],
        camera=Camera(lookfrom=(2.0, 1.5, 3.0), lookat=(0.3, 0.0, 0.0),
                      vup=(0.0, 1.0, 0.0), vfov_degrees=35.0),
        ambient=(0.0, 0.0, 0.0),
    )
    scene = compile_scene(world)
    render = make_renderer(world.camera, 32, 24, 32, 4, sample_batch=8,
                           sky=world.ambient,
                           nee_lights=extract_lights(world))
    img = np.asarray(render(scene, KEY, 0)[0])
    assert np.isfinite(img).all()
    # Direct term <= albedo*emit; pickup <= emit; a pixel can see the
    # light directly (= emit) but floor pixels' direct+indirect stays
    # near albedo*emit. The real assertion: nothing blows past the
    # emitter's own radiance (unweighted NEE produced >> emit spikes).
    assert img.max() <= emit * (1 + 1e-4), img.max()


def test_nee_inside_light_keeps_energy():
    """A surface enclosed by a dome light cannot cone-sample it (inside
    the sphere): NEE must fall back to the pure-BSDF estimator with
    pickup kept — bitwise the non-NEE image — instead of rendering black
    (the energy-loss bug this guards against)."""
    from myraytracer_tpu.scene.api import (
        Camera, DiffuseLight, Lambertian, Sphere, World,
    )

    world = World(
        spheres=[
            Sphere((0.0, -1000.5, 0.0), 1000.0,
                   Lambertian((0.6, 0.6, 0.6))),
            Sphere((0.0, 0.0, 0.0), 100.0, DiffuseLight((2.0, 2.0, 2.0))),
        ],
        camera=Camera(lookfrom=(0.0, 2.0, 4.0), lookat=(0.0, 0.0, 0.0),
                      vup=(0.0, 1.0, 0.0), vfov_degrees=40.0),
        ambient=(0.0, 0.0, 0.0),
    )
    scene = compile_scene(world)
    kw = dict(sky=world.ambient, sample_batch=2)
    a, _ = make_renderer(world.camera, 16, 8, 4, 6, **kw)(scene, KEY, 0)
    b, _ = make_renderer(world.camera, 16, 8, 4, 6,
                         nee_lights=extract_lights(world), **kw)(
        scene, KEY, 0)
    a, b = np.asarray(a), np.asarray(b)
    assert a.mean() > 0.5  # the dome illuminates everything
    np.testing.assert_array_equal(b, a)
