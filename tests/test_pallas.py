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


@pytest.mark.slow
def test_deep_depth_parity():
    """Depths past MAX_DEPTH (paged draw keys, core/rng.py) stay bitwise
    across backends: both paths compute the same per-lane page keys."""
    world = presets.three_sphere_scene()
    scene = compile_scene(world)
    depth = crng.MAX_DEPTH + 8
    jnp_render = make_jnp_renderer(
        world.camera, W, H, SPP, depth, sample_batch=SPP
    )
    pal_render = make_pallas_renderer(
        world.camera, W, H, SPP, depth, tile_rows=8, interpret=True
    )
    a, segs_a = jnp_render(scene, KEY, 0)
    b, segs_b = pal_render(scene, KEY, 0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                               atol=1e-6)
    assert float(segs_a) == float(segs_b)


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_mesh_culled_parity():
    """>64 triangles engages the chunked/gated triangle sweep."""
    world = presets.mesh_scene(subdivisions=1)  # ~190 triangles
    assert world.triangle_count > 64
    a, b, sa, sb = render_pair(world)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert sa == sb


@pytest.mark.slow
def test_superchunk_gating_bitwise():
    """Two-level (superchunk) gating is conservative — bitwise-identical
    to single-level chunk gating, for spheres and triangles."""
    from myraytracer_tpu.kernels.trace import KernelConfig

    for world, sort in (
        (presets.final_scene(seed=0), True),      # 15 sphere chunks
        (presets.mesh_scene(subdivisions=1), False),  # 3 tri chunks
    ):
        scene = compile_scene(world, spatial_sort=sort)

        def render(config=None):
            r = make_pallas_renderer(
                world.camera, W, H, 1, 4, tile_rows=8, interpret=True,
                config=config,
            )
            img, segs = r(scene, KEY, 0)
            return np.asarray(img), float(segs)

        base_img, base_segs = render()
        # Engage the outer gates via an explicit config (no module state).
        sup_img, sup_segs = render(KernelConfig(SUPER=2, SUPER_MIN=2))
        assert np.array_equal(sup_img, base_img)
        assert sup_segs == base_segs


@pytest.mark.slow
def test_lane_gate_and_kd_partition_bitwise():
    """The per-lane chunk mask (LANE_GATE) and the kd chunk partition are
    both exact transforms: the mask is the conservative slab test the
    gate already passed, and reordering spheres changes only equal-t
    tie-breaking (absent in a random scene) — images and segment counts
    must match the baseline bit-for-bit."""
    from myraytracer_tpu.kernels.trace import KernelConfig

    world = presets.final_scene(seed=0)  # 486 spheres, 15 gated chunks

    def render(config=None, partition="morton"):
        scene = compile_scene(world, spatial_sort=True, partition=partition)
        r = make_pallas_renderer(
            world.camera, W, H, 1, 4, tile_rows=8, interpret=True,
            config=config,
        )
        img, segs = r(scene, KEY, 0)
        return np.asarray(img), float(segs)

    base_img, base_segs = render()
    lane_img, lane_segs = render(KernelConfig(LANE_GATE=True))
    assert np.array_equal(lane_img, base_img)
    assert lane_segs == base_segs
    kd_img, kd_segs = render(partition="kd")
    assert np.array_equal(kd_img, base_img)
    assert kd_segs == base_segs


@pytest.mark.slow
def test_sweep_width_and_fori_bitwise():
    """Tree-combine sweeps (SWEEP_WIDTH) are exact at every width, on the
    unrolled, gated-unrolled, and grouped-fori (>UNROLL_TOTAL_MAX
    spheres) interiors."""
    from myraytracer_tpu.kernels import trace
    from myraytracer_tpu.scene.api import Lambertian, Metal, Sphere, World

    rng = np.random.RandomState(1)
    spheres = [
        Sphere(
            tuple(c), 0.3,
            Metal((0.7, 0.7, 0.7), 0.2) if i % 3 else Lambertian((0.5, 0.5, 0.5)),
        )
        for i, c in enumerate(rng.uniform(-6.0, 6.0, (1100, 3)))
    ]
    world = World(spheres=spheres)
    scene = compile_scene(world, spatial_sort=True)
    assert scene.padded_size > trace.UNROLL_TOTAL_MAX  # fori interiors

    def render(width):
        r = make_pallas_renderer(
            world.camera, W, H, 1, 2, tile_rows=8, interpret=True,
            config=trace.KernelConfig(SWEEP_WIDTH=width),
        )
        img, segs = r(scene, KEY, 0)
        return np.asarray(img), float(segs)

    results = {w: render(w) for w in (1, 4)}
    assert np.array_equal(results[1][0], results[4][0])
    assert results[1][1] == results[4][1]


@pytest.mark.slow
def test_packed_runtime_camera():
    """The packed camera operand (scene.cam) reproduces the closure
    camera and lets one compiled renderer serve new cameras."""
    from myraytracer_tpu.render import camera as cam_mod
    from myraytracer_tpu.scene.api import Camera

    world = presets.defocus_scene()
    scene = compile_scene(world)
    cam_b = Camera(
        lookfrom=(4.0, 1.5, 2.0), lookat=(0.0, 0.0, -1.0),
        vup=(0.0, 1.0, 0.0), vfov_degrees=30.0, aperture=0.4,
        focus_dist=4.5,
    )
    pack = cam_mod.pack_camera(cam_b, W, H)

    # Oracle: closure camera vs packed runtime camera (same math order).
    jnp_a = make_jnp_renderer(cam_b, W, H, SPP, DEPTH, sample_batch=SPP)
    jnp_b = make_jnp_renderer(world.camera, W, H, SPP, DEPTH, sample_batch=SPP)
    a, _ = jnp_a(scene, KEY, 0)
    b, _ = jnp_b(scene._replace(cam=pack), KEY, 0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7)

    # Kernel: renderer built for the defocus camera, driven to camera B at
    # run time — must match a renderer built for camera B outright.
    pal_a = make_pallas_renderer(cam_b, W, H, SPP, DEPTH, tile_rows=8,
                                 interpret=True)
    pal_b = make_pallas_renderer(world.camera, W, H, SPP, DEPTH, tile_rows=8,
                                 interpret=True)
    ka, _ = pal_a(scene, KEY, 0)
    kb, _ = pal_b(scene._replace(cam=pack), KEY, 0)
    assert np.array_equal(np.asarray(ka), np.asarray(kb))
    # and the kernel still matches the oracle on the new camera
    np.testing.assert_allclose(np.asarray(kb), np.asarray(a), rtol=1e-5,
                               atol=1e-6)


def test_smem_budget_cap():
    """SMEM capacity accounting: big primitive tables move to VMEM (no
    raise); forcing SMEM placement past the budget raises clearly; the
    dispatch fallback now triggers only on gate-table overflow."""
    import jax.numpy as jnp

    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.kernels import trace
    from myraytracer_tpu.render import dispatch
    from myraytracer_tpu.scene.api import Lambertian, Sphere, World

    assert trace.fits_in_smem(486, 0)          # the RTiOW final scene
    assert trace.fits_in_smem(64, 6500)        # mesh_scene subdiv 4
    assert not trace.fits_in_smem(0, 30000)    # tri table too big for SMEM
    # ... but with the tables in VMEM only the AABB gates stay in SMEM:
    assert trace.fits_in_smem(0, 30000, tri_table_in_smem=False)
    assert trace.fits_in_smem(486, 200000, tri_table_in_smem=False)
    assert not trace.fits_in_smem(40000, 0)    # sphere SMEM cap ...
    assert trace.fits_in_smem(40000, 0, sph_table_in_smem=False)  # VMEM
    # gate tables alone DO cap eventually (tens of millions):
    assert not trace.fits_in_smem(
        50_000_000, 0, tri_table_in_smem=False, sph_table_in_smem=False
    )

    big = World(spheres=[
        Sphere((float(i % 200), float(i // 200), -5.0), 0.1,
               Lambertian((0.5, 0.5, 0.5)))
        for i in range(40000)
    ])
    scene = compile_scene(big)
    # Forced-SMEM placement past the budget raises clearly:
    block = trace.make_block_renderer(
        big.camera, 16, 8, 8, 1, 2, tile_rows=8, interpret=True,
        config=trace.KernelConfig(SPH_VMEM=False),
    )
    with pytest.raises(ValueError, match="SMEM"):
        block(scene, KEY, jnp.uint32(0), jnp.uint32(0), jnp.uint32(1))

    # auto mode keeps both big-sphere and big-mesh scenes on the kernel
    # now (VMEM tables); the jnp fallback is for gate-table overflow only.
    orig = dispatch.resolve_backend
    dispatch.resolve_backend = lambda config: "pallas"
    try:
        session = dispatch.make_session(big, RenderConfig(
            width=16, height=8, samples_per_frame=1, ray_depth=2,
            backend="auto",
        ))
        assert session.config.backend == "auto"
        mesh_world = presets.mesh_scene(subdivisions=5)
        session2 = dispatch.make_session(mesh_world, RenderConfig(
            width=16, height=8, samples_per_frame=1, ray_depth=2,
            backend="auto",
        ))
        assert session2.config.backend == "auto"
    finally:
        dispatch.resolve_backend = orig


@pytest.mark.slow
def test_sph_vmem_bitwise():
    """The VMEM sphere table is exact: bitwise vs the SMEM table on the
    final scene (leaders + culled chunks + merged record)."""
    from myraytracer_tpu.kernels.trace import KernelConfig

    world = presets.final_scene(seed=0)
    scene = compile_scene(world, spatial_sort=True)

    def render(config=None):
        r = make_pallas_renderer(
            world.camera, W, H, 1, 4, tile_rows=8, interpret=True,
            config=config,
        )
        img, segs = r(scene, KEY, 0)
        return np.asarray(img), float(segs)

    base_img, base_segs = render()
    img, segs = render(KernelConfig(SPH_VMEM=True))
    assert np.array_equal(img, base_img)
    assert segs == base_segs


@pytest.mark.slow
def test_tri_vmem_and_dynamic_gates_bitwise():
    """The VMEM triangle table and the dynamic (fori) chunk gates are
    exact: bitwise vs the default SMEM/unrolled configuration."""
    from myraytracer_tpu.kernels.trace import KernelConfig

    world = presets.mesh_scene(subdivisions=1)  # ~190 tris, 3 chunks
    scene = compile_scene(world, spatial_sort=False)

    def render(config=None):
        r = make_pallas_renderer(
            world.camera, W, H, 1, 4, tile_rows=8, interpret=True,
            config=config,
        )
        img, segs = r(scene, KEY, 0)
        return np.asarray(img), float(segs)

    base_img, base_segs = render()
    for config in (
        KernelConfig(TRI_VMEM=True),
        KernelConfig(CHUNK_UNROLL_MAX=1),
        KernelConfig(TRI_VMEM=True, CHUNK_UNROLL_MAX=1),
        KernelConfig(TRI_VMEM=True, CHUNK_UNROLL_MAX=1,
                     SUPER=2, SUPER_MIN=2),  # dynamic two-level gating
    ):
        img, segs = render(config)
        assert np.array_equal(img, base_img), config
        assert segs == base_segs, config


@pytest.mark.slow
def test_sphere_dynamic_gates_bitwise():
    """Dynamic sphere chunk gates (fori past CHUNK_UNROLL_MAX) are exact
    on the final scene, including dynamic two-level gating."""
    from myraytracer_tpu.kernels.trace import KernelConfig

    world = presets.final_scene(seed=0)  # ~15 sphere chunks
    scene = compile_scene(world, spatial_sort=True)

    def render(config=None):
        r = make_pallas_renderer(
            world.camera, W, H, 1, 4, tile_rows=8, interpret=True,
            config=config,
        )
        img, segs = r(scene, KEY, 0)
        return np.asarray(img), float(segs)

    base_img, base_segs = render()
    for config in (
        KernelConfig(CHUNK_UNROLL_MAX=1),
        KernelConfig(CHUNK_UNROLL_MAX=1, SUPER=2, SUPER_MIN=2),
    ):
        img, segs = render(config)
        assert np.array_equal(img, base_img), config
        assert segs == base_segs, config


@pytest.mark.slow
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


def _session_kwargs(world):
    """Derive the factory kwargs exactly as RenderSession does."""
    mats = {s.material.type_id for s in world.spheres}
    mats |= {m.material.type_id for m in world.meshes}
    return dict(material_set=tuple(sorted(mats)), sky=world.ambient)


def render_pair_full(world, depth=DEPTH):
    """render_pair with the session's material_set/sky derivation (needed
    for scenes whose material families exceed the (1,2,3) default)."""
    scene = compile_scene(world)
    kw = _session_kwargs(world)
    jnp_render = make_jnp_renderer(
        world.camera, W, H, SPP, depth, sample_batch=SPP, **kw
    )
    pal_render = make_pallas_renderer(
        world.camera, W, H, SPP, depth, tile_rows=8, interpret=True, **kw
    )
    a, segs_a = jnp_render(scene, KEY, 0)
    b, segs_b = pal_render(scene, KEY, 0)
    return np.asarray(a), np.asarray(b), float(segs_a), float(segs_b)


def test_light_scene_parity():
    """Emissive spheres + constant black background (World.ambient)."""
    a, b, sa, sb = render_pair_full(presets.light_scene())
    assert np.isfinite(b).all()
    assert b.max() > 0.5  # the lights actually illuminate
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert sa == sb


@pytest.mark.slow
def test_cornell_scene_parity():
    """Triangle-quad walls + an emissive quad light: the emission path
    through the triangle winner record (rows 9-12)."""
    a, b, sa, sb = render_pair_full(presets.cornell_scene())
    assert np.isfinite(b).all()
    assert b.max() > 0.5
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert sa == sb


def test_four_material_family_parity():
    """All four families in one scene exercises the 2-bit sign-packed
    material decode at its full width (kernels/trace.py _pack_mat_bits)."""
    from myraytracer_tpu.scene.api import (
        Camera, Dielectric, DiffuseLight, Lambertian, Metal, Sphere, World,
    )

    world = World(
        spheres=[
            Sphere((0.0, -100.5, -1.0), 100.0, Lambertian((0.8, 0.8, 0.0))),
            Sphere((0.0, 0.0, -1.0), 0.5, DiffuseLight((3.0, 2.0, 1.0))),
            Sphere((-1.0, 0.0, -1.0), 0.5, Dielectric(1.5)),
            Sphere((1.0, 0.0, -1.0), 0.5, Metal((0.8, 0.6, 0.2), fuzz=0.3)),
        ],
        camera=Camera.reference(),
    )
    a, b, sa, sb = render_pair_full(world)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert sa == sb


@pytest.mark.slow
def test_constant_sky_parity():
    """World.ambient with a non-black constant replaces the sky gradient
    in both paths identically (no emissive materials involved)."""
    base = presets.reference_scene()
    from myraytracer_tpu.scene.api import World

    world = World(base.spheres, camera=base.camera, ambient=(0.2, 0.3, 0.4))
    a, b, _, _ = render_pair_full(world)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    # And it differs from the gradient-sky image (the knob does something).
    a0, _, _, _ = render_pair_full(base)
    assert np.abs(a - a0).max() > 1e-3


def test_zero_red_emission_sign_packing():
    """emit_r == 0.0 must survive the sign-bit material packing: the
    packed value is -0.0, whose sign bit still decodes the light type
    and whose abs() restores exact 0.0 (kernels/trace.py _pack_mat_bits)."""
    from myraytracer_tpu.scene.api import (
        Camera, DiffuseLight, Lambertian, Sphere, World,
    )

    world = World(
        spheres=[
            Sphere((0.0, -100.5, -1.0), 100.0, Lambertian((0.6, 0.6, 0.6))),
            Sphere((0.0, 0.0, -1.0), 0.5, DiffuseLight((0.0, 3.0, 5.0))),
        ],
        camera=Camera.reference(),
        ambient=(0.0, 0.0, 0.0),
    )
    a, b, sa, sb = render_pair_full(world)
    assert np.isfinite(b).all()
    # The light shows in G/B but its R is exactly zero everywhere the
    # camera sees it directly.
    assert b[..., 2].max() > 0.5
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert sa == sb


@pytest.mark.slow
def test_no_metal_light_decode_parity():
    """Material set (1,3,4) — no Metal: the fuzz row is still carried
    because its SIGN holds the type index's high bit. Regression for the
    light-decodes-as-Lambertian bug (the emitter rendered black under a
    black ambient)."""
    from myraytracer_tpu.scene.api import (
        Camera, Dielectric, DiffuseLight, Lambertian, Sphere, World,
    )

    world = World(
        spheres=[
            Sphere((0.0, -100.5, -1.0), 100.0, Lambertian((0.7, 0.7, 0.7))),
            Sphere((0.0, 0.0, -1.0), 0.5, DiffuseLight((4.0, 3.0, 2.0))),
            Sphere((1.0, 0.0, -1.0), 0.5, Dielectric(1.5)),
        ],
        camera=Camera.reference(),
        ambient=(0.0, 0.0, 0.0),
    )
    a, b, sa, sb = render_pair_full(world)
    assert b.max() > 0.5  # the light emits (it was black pre-fix)
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert sa == sb
    # Same set with a scene-uniform IOR baked static (drops the IOR row
    # but must keep the fuzz row).
    scene = compile_scene(world)
    kw = dict(material_set=(1, 3, 4), sky=world.ambient, static_ior=1.5)
    jr = make_jnp_renderer(world.camera, W, H, SPP, DEPTH, sample_batch=SPP,
                           **{k: v for k, v in kw.items() if k != "static_ior"})
    pr = make_pallas_renderer(world.camera, W, H, SPP, DEPTH, tile_rows=8,
                              interpret=True, **kw)
    aa, _ = jr(scene, KEY, 0)
    bb, _ = pr(scene, KEY, 0)
    np.testing.assert_allclose(np.asarray(bb), np.asarray(aa),
                               rtol=1e-5, atol=1e-6)
