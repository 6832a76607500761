"""Integrator behavior tests (semantics of shader.wgsl:336-386)."""

import functools

import numpy as np
import pytest

from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.render.integrator import make_renderer
from myraytracer_tpu.scene import api, presets
from myraytracer_tpu.scene.compile import compile_scene

W, H = 24, 12
KEY = crng.key_from_seed(0)


@functools.lru_cache(maxsize=None)
def small_renderer(spp=4, depth=8):
    cam = api.Camera.reference()
    return make_renderer(cam, W, H, spp, depth, sample_batch=2)


def test_empty_scene_is_sky():
    scene = compile_scene(api.World([]))
    render = small_renderer()
    img, segs = render(scene, KEY, 0)
    img = np.asarray(img)
    assert img.shape == (H, W, 3)
    # Sky gradient bounds: r,g in [0.5, 1], b == 1 everywhere.
    assert (img[..., 2] > 0.999).all()
    assert (img[..., 0] >= 0.5 - 1e-6).all() and (img[..., 0] <= 1.0 + 1e-6).all()
    # Reference orientation: top row has viewport y ≈ -1 → whiter (redder)
    # than the bottom row (camera.py docstring; shader.wgsl:26,374).
    assert img[0, :, 0].mean() > img[-1, :, 0].mean()
    # Every camera ray missed on the first segment: segments == lanes * spp.
    assert float(segs) == W * H * 4


def test_deterministic_across_calls():
    scene = compile_scene(presets.reference_scene())
    render = small_renderer()
    a, _ = render(scene, KEY, 0)
    b, _ = render(scene, KEY, 0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c, _ = render(scene, KEY, 100)  # different sample window → different noise
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_radiance_finite_and_bounded():
    scene = compile_scene(presets.reference_scene())
    render = small_renderer()
    img, segs = render(scene, KEY, 0)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    # No emitter exceeds the sky; throughput only attenuates.
    assert img.max() <= 1.0 + 1e-5
    # Some rays bounce: more segments than camera rays, bounded by depth.
    assert W * H * 4 < float(segs) <= W * H * 4 * 8


def test_error_shrinks_with_more_frames():
    """Mean pixel error vs a many-frame reference shrinks ~ 1/sqrt(n)."""
    scene = compile_scene(presets.reference_scene())
    render = small_renderer()

    frames = [np.asarray(render(scene, KEY, 4 * i)[0]) for i in range(40)]
    ref = np.mean(frames[8:], axis=0)  # 32-frame "converged" reference
    err1 = np.abs(frames[0] - ref).mean()
    err8 = np.abs(np.mean(frames[:8], axis=0) - ref).mean()
    # 8x the samples → ~2.8x error reduction; allow generous slack.
    assert err8 < err1 / 1.7


def test_dielectric_scene_traces():
    scene = compile_scene(presets.three_sphere_scene())
    render = small_renderer()
    img, _ = render(scene, KEY, 0)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.max() > 0.1  # something visible


def test_deep_depth_renders_and_is_deterministic():
    """Any u32 --ray-depth renders (reference CLI contract,
    native-runner/src/main.rs:27-28): depths past MAX_DEPTH page the
    bounce draws under derived keys (core/rng.py depth_page_key)."""
    scene = compile_scene(presets.three_sphere_scene())
    deep = make_renderer(
        api.Camera.reference(), W, H, 2, crng.MAX_DEPTH + 38, sample_batch=2
    )
    a, segs = deep(scene, KEY, 0)
    a = np.asarray(a)
    assert np.isfinite(a).all() and (a >= 0).all()
    b, _ = deep(scene, KEY, 0)
    np.testing.assert_array_equal(a, np.asarray(b))
    # The dielectric scene has long glass chains, but depth-100 radiance
    # still matches a depth-62 render statistically (the tail carries
    # almost no energy) — catches page-key stream corruption that a
    # determinism check alone would miss.
    shallow = make_renderer(
        api.Camera.reference(), W, H, 2, crng.MAX_DEPTH, sample_batch=2
    )
    c = np.asarray(shallow(scene, KEY, 0)[0])
    assert abs(a.mean() - c.mean()) < 0.02, (a.mean(), c.mean())


def test_deep_depth_early_termination_matches_shallow_bitwise():
    """On a scene whose every path retires on page 0 (empty world: all
    camera rays miss at bounce 0), a paged renderer is bitwise the
    single-page one — page 0 IS the legacy stream."""
    scene = compile_scene(api.World([]))
    shallow = make_renderer(api.Camera.reference(), W, H, 2, 8, sample_batch=2)
    deep = make_renderer(
        api.Camera.reference(), W, H, 2, crng.MAX_DEPTH + 100, sample_batch=2
    )
    np.testing.assert_array_equal(
        np.asarray(shallow(scene, KEY, 0)[0]), np.asarray(deep(scene, KEY, 0)[0])
    )


def test_depth_page_key_contract():
    """Page 0 is the main key; pages >= 1 derive distinct keys, and the
    same draw slot under different pages yields independent uniforms."""
    import jax.numpy as jnp

    k0 = crng.depth_page_key(KEY, 0)
    assert int(k0[0]) == int(KEY[0]) and int(k0[1]) == int(KEY[1])
    lanes = jnp.arange(64, dtype=jnp.uint32)
    seen = set()
    for page in (0, 1, 2, 7):
        kp = crng.depth_page_key(KEY, page)
        seen.add((int(kp[0]), int(kp[1])))
        u1, _ = crng.uniform2(kp, lanes, jnp.uint32(5))
        assert float(jnp.min(u1)) >= 0.0 and float(jnp.max(u1)) < 1.0
    assert len(seen) == 4  # all distinct
    # Page keys never collide with the RR fold for reachable pages.
    max_page = (0xFFFFFFFF // crng.BOUNCES_PER_PAGE) + 1
    assert crng.DEPTH_PAGE_FOLD + max_page < crng.RR_KEY_FOLD


def test_emissive_hit_returns_throughput_times_emission():
    """A camera ray that hits a light under a black sky carries exactly
    the emission (throughput 1 on the first bounce); misses stay black."""
    import numpy as np

    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.render.integrator import make_renderer
    from myraytracer_tpu.scene.api import (
        Camera, DiffuseLight, Sphere, World,
    )
    from myraytracer_tpu.scene.compile import compile_scene

    world = World(
        spheres=[Sphere((0.0, 0.0, -1.0), 0.5, DiffuseLight((4.0, 3.0, 2.0)))],
        camera=Camera.reference(),
        ambient=(0.0, 0.0, 0.0),
    )
    scene = compile_scene(world)
    render = make_renderer(
        world.camera, 16, 8, 1, 4, sample_batch=1,
        material_set=(4,), sky=world.ambient,
    )
    img, _ = render(scene, crng.key_from_seed(0), 0)
    img = np.asarray(img)
    center = img[4, 8]
    np.testing.assert_allclose(center, [4.0, 3.0, 2.0], rtol=1e-6)
    np.testing.assert_array_equal(img[0, 0], [0.0, 0.0, 0.0])  # black sky
