"""Pallas megakernel vs jnp oracle parity (interpret mode on CPU).

Both paths consume the identical threefry (pixel, sample, bounce) stream,
so images must agree to f32 accumulation tolerance (golden-parity contract
between compute paths, SURVEY.md §7.1 step 5).
"""

import numpy as np
import pytest

from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.kernels.trace import make_renderer as make_pallas_renderer
from myraytracer_tpu.render.integrator import make_renderer as make_jnp_renderer
from myraytracer_tpu.scene import presets
from myraytracer_tpu.scene.compile import compile_scene

W, H, SPP, DEPTH = 16, 8, 2, 4
KEY = crng.key_from_seed(0)


def render_pair(world):
    scene = compile_scene(world)
    jnp_render = make_jnp_renderer(world.camera, W, H, SPP, DEPTH, sample_batch=SPP)
    pal_render = make_pallas_renderer(
        world.camera, W, H, SPP, DEPTH, tile_rows=8, interpret=True
    )
    a, segs_a = jnp_render(scene, KEY, 0)
    b, segs_b = pal_render(scene, KEY, 0)
    return np.asarray(a), np.asarray(b), float(segs_a), float(segs_b)


def test_reference_scene_parity():
    a, b, sa, sb = render_pair(presets.reference_scene())
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert sa == sb  # identical RNG stream → identical termination


def test_dielectric_scene_parity():
    a, b, _, _ = render_pair(presets.three_sphere_scene())
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_defocus_scene_parity():
    a, b, _, _ = render_pair(presets.defocus_scene())
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_final_scene_culled_parity():
    """>64 spheres engages the chunk-AABB culled sweep; culling is
    conservative so results match the oracle exactly (same stream)."""
    world = presets.final_scene(seed=0)
    from myraytracer_tpu.scene.compile import compile_scene as cs

    scene = cs(world, spatial_sort=True)
    jnp_render = make_jnp_renderer(world.camera, W, H, 1, 4, sample_batch=1)
    pal_render = make_pallas_renderer(
        world.camera, W, H, 1, 4, tile_rows=8, interpret=True
    )
    a, _ = jnp_render(scene, KEY, 0)
    b, _ = pal_render(scene, KEY, 0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)


def test_mesh_scene_parity():
    """Triangle sweep in the megakernel matches the oracle (same stream)."""
    from myraytracer_tpu.scene.api import Lambertian, Mesh, Metal, Sphere, World
    from myraytracer_tpu.scene import meshgen

    bv, bf = meshgen.box((0.6, 0.0, -1.2), (0.4, 0.4, 0.4))
    gv, gf = meshgen.quad((-4, -0.5, 2), (4, -0.5, 2), (4, -0.5, -6), (-4, -0.5, -6))
    world = World(
        spheres=[Sphere((-0.8, 0.0, -1.0), 0.5, Metal((0.8, 0.8, 0.8), 0.1))],
        meshes=[
            Mesh(gv, gf, Lambertian((0.8, 0.8, 0.0))),
            Mesh(bv, bf, Lambertian((0.2, 0.4, 0.8))),
        ],
    )
    a, b, sa, sb = render_pair(world)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert sa == sb


def test_mesh_culled_parity():
    """>64 triangles engages the chunked/gated triangle sweep."""
    world = presets.mesh_scene(subdivisions=1)  # ~190 triangles
    assert world.triangle_count > 64
    a, b, sa, sb = render_pair(world)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert sa == sb


def test_sample_window_masking():
    """n_valid masking: spp=3 renderer over a 2-sample window."""
    world = presets.reference_scene()
    scene = compile_scene(world)
    from myraytracer_tpu.kernels.trace import make_block_renderer

    block = make_block_renderer(
        world.camera, W, H, H, 3, DEPTH, tile_rows=8, interpret=True
    )
    import jax.numpy as jnp

    full, _ = block(scene, KEY, jnp.uint32(0), jnp.uint32(0), jnp.uint32(3))
    two, _ = block(scene, KEY, jnp.uint32(0), jnp.uint32(0), jnp.uint32(2))
    one, _ = block(scene, KEY, jnp.uint32(0), jnp.uint32(2), jnp.uint32(1))
    np.testing.assert_allclose(
        np.asarray(two) + np.asarray(one), np.asarray(full), rtol=1e-5, atol=1e-6
    )
