"""Unit tests for the Pallas kernel's SMEM scene-table packing.

These check the invariants the kernel relies on (kernels/trace.py
``_scene_to_prefetch``): lossless sign-bit material packing, pad-slot
relocation (pads must never be hittable in the table), leader hoisting,
and chunk-AABB exclusion of pads — without compiling any kernel.
"""

import numpy as np

from myraytracer_tpu.kernels import trace
from myraytracer_tpu.scene import api
from myraytracer_tpu.scene.compile import LEADERS, compile_scene
from myraytracer_tpu.scene.presets import get_scene


def _world(n=100, seed=3):
    rng = np.random.default_rng(seed)
    mats = [
        api.Lambertian(albedo=(0.5, 0.25, 0.125)),
        api.Metal(albedo=(1.0, 0.5, 0.25), fuzz=0.375),
        api.Dielectric(ior=1.5),
    ]
    spheres = [
        api.Sphere(
            center=tuple(rng.uniform(-10, 10, 3).astype(np.float32).tolist()),
            radius=float(rng.uniform(0.1, 0.5)),
            material=mats[i % 3],
        )
        for i in range(n - 1)
    ]
    # One giant: must end up hoisted into the leader slots.
    spheres.append(
        api.Sphere(center=(0.0, -1000.0, 0.0), radius=1000.0,
                   material=api.Lambertian(albedo=(0.5, 0.5, 0.5)))
    )
    return api.World(tuple(spheres), camera=api.Camera.reference())


def test_pack_mat_bits_roundtrip_exact():
    import jax.numpy as jnp

    ms = (1, 2, 3)
    albedo = jnp.asarray([0.5, 0.25, 0.0, 1.0], jnp.float32)
    fuzz = jnp.asarray([0.0, 0.375, 0.0, 0.0], jnp.float32)
    mat = jnp.asarray([1, 2, 3, 1], jnp.int32)
    ax, fz = trace._pack_mat_bits(albedo, fuzz, mat, ms)
    ax, fz = np.asarray(ax), np.asarray(fz)
    # |packed| recovers the exact original values (including 0.0 via -0.0)
    np.testing.assert_array_equal(np.abs(ax), np.asarray(albedo))
    np.testing.assert_array_equal(np.abs(fz), np.asarray(fuzz))
    # sign bits decode back to the material index in sorted(ms)
    b0 = np.signbit(ax).astype(int)
    b1 = np.signbit(fz).astype(int)
    idx = b0 + 2 * b1
    np.testing.assert_array_equal(
        np.asarray([sorted(ms)[i] for i in idx]), np.asarray(mat)
    )


def test_prefetch_layout_invariants():
    world = _world()
    scene = compile_scene(world, spatial_sort=True)
    sf, aabb, saabb, trf, traabb, tsaabb = trace._scene_to_prefetch(scene, (1, 2, 3), trace.DEFAULT_CONFIG)
    sf = np.asarray(sf)
    aabb = np.asarray(aabb)

    # 9 rows; table sized LEADERS + k * CULL_CHUNK
    assert sf.shape[0] == 9
    assert (sf.shape[1] - LEADERS) % trace.CULL_CHUNK == 0

    # the giant sphere is in the leader slots
    assert np.abs(sf[3, :LEADERS]).max() == 1000.0

    # pads are relocated far away and everything else is where it was
    n_real = len(world.spheres)
    assert (sf[0, n_real:] > 1e29).all()
    # every real sphere's |r| appears in the signed-radius row
    got = set(np.round(np.abs(sf[3, :n_real]).astype(np.float64), 5))
    want = set(
        np.round(
            np.abs(np.asarray([s.radius for s in world.spheres], np.float32))
            .astype(np.float64),
            5,
        )
    )
    assert got == want

    # chunk AABBs: lo <= hi on every real chunk; pads never widen a box
    n_chunks = aabb.shape[1]
    assert n_chunks == (sf.shape[1] - LEADERS) // trace.CULL_CHUNK
    lo, hi = aabb[:3], aabb[3:]
    real = lo[0] < 1e29  # all-pad chunks keep the inverted sentinel box
    assert (lo[:, real] <= hi[:, real]).all()
    assert np.abs(aabb[:, real]).max() < 100.0  # giants are not in chunks


def test_resolve_tri_chunk_auto_ladder():
    cfg = trace.DEFAULT_CONFIG
    # Auto (TRI_CHUNK=0): measured ladder by triangle count.
    assert trace.resolve_tri_chunk(cfg, 0) == 64
    assert trace.resolve_tri_chunk(cfg, 420) == 64
    assert trace.resolve_tri_chunk(cfg, 768) == 64
    assert trace.resolve_tri_chunk(cfg, 769) == 32
    assert trace.resolve_tri_chunk(cfg, 8192) == 32
    assert trace.resolve_tri_chunk(cfg, 8193) == 16
    assert trace.resolve_tri_chunk(cfg, 102400) == 16
    # Explicit width always wins.
    assert trace.resolve_tri_chunk(cfg.replace(TRI_CHUNK=64), 20480) == 64
    # Raw-vs-padded consistency: padding to the resolved chunk never
    # crosses a ladder threshold (the kernel body resolves on the padded
    # table width).
    for n in (760, 768, 769, 8190, 8192, 8193, 20480):
        c = trace.resolve_tri_chunk(cfg, n)
        padded = n + (-n) % c
        assert trace.resolve_tri_chunk(cfg, padded) == c


def test_tri_prefetch_chunk_width_matches_resolver():
    from myraytracer_tpu.scene.presets import mesh_scene

    world = mesh_scene(subdivisions=3)  # 1280 icosphere tris + props
    scene = compile_scene(world, spatial_sort=True)
    n_tris = scene.tris.v0.x.shape[0]
    chunk = trace.resolve_tri_chunk(trace.DEFAULT_CONFIG, n_tris)
    assert chunk == 32
    _, _, _, trf, traabb, _ = trace._scene_to_prefetch(
        scene, (1, 2, 3), trace.DEFAULT_CONFIG
    )
    assert trf.shape[1] % chunk == 0
    assert traabb.shape[1] == trf.shape[1] // chunk


def test_prefetch_small_scene_has_dummy_aabb():
    world = get_scene("three-sphere", seed=0)
    scene = compile_scene(world)
    sf, aabb, saabb, trf, traabb, tsaabb = trace._scene_to_prefetch(scene, (1, 2, 3), trace.DEFAULT_CONFIG)
    # sub-chunk scene: no chunks, but a nonzero-sized dummy AABB operand
    # (Mosaic rejects f32[6,0] prefetch operands)
    assert np.asarray(aabb).shape == (6, 1)
    assert np.asarray(traabb).shape[1] >= 1
