"""Procedural textures: API, noise core, compiler rows, oracle rendering.

The reference has constant-color materials only (lib.rs:611-639); textures
are an extension with RTiOW book-2 semantics re-expressed TPU-first
(render/textures.py, core/noise.py). These tests pin:

* the API validation contract (nonnegative colors, positive scale — the
  kernel's sign-bit packing relies on it),
* exact checker parity and the noise/band value contracts,
* the compiler's texture rows (including Morton reordering and the
  untextured-scene pytree staying unchanged),
* the oracle render actually showing the pattern.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.core.noise import triangle_wave, turbulence, value_noise
from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.render.hit import closest_hit
from myraytracer_tpu.render.integrator import make_renderer
from myraytracer_tpu.render.textures import apply_texture, checker_albedo
from myraytracer_tpu.scene import api, presets
from myraytracer_tpu.scene.compile import compile_scene

KEY = crng.key_from_seed(0)


def _v3(x, y, z):
    return V3(jnp.float32(x), jnp.float32(y), jnp.float32(z))


def test_api_validation():
    with pytest.raises(ValueError):
        api.Checker((0.5, -0.1, 0.5), (0.1, 0.1, 0.1))
    with pytest.raises(ValueError):
        api.Checker((0.5, 0.1, 0.5), (0.1, 0.1, 0.1), scale=0.0)
    with pytest.raises(ValueError):
        api.Marble((1.0, 1.0, 1.0), scale=-1.0)
    # Textured Lambertian construction is fine; tex_id reports the family.
    lam = api.Lambertian(api.Marble())
    assert lam.tex_id == api.TEXTURE_MARBLE
    assert api.Lambertian((0.5, 0.5, 0.5)).tex_id == api.TEXTURE_SOLID


def test_world_sets():
    w = api.World(
        spheres=[
            api.Sphere((0, 0, -1), 0.5, api.Lambertian(api.Checker((1, 1, 1), (0, 0, 0)))),
            api.Sphere((1, 0, -1), 0.5, api.Metal((0.8, 0.8, 0.8))),
        ],
    )
    assert w.texture_set == (api.TEXTURE_CHECKER,)
    assert w.material_set == (api.MATERIAL_LAMBERTIAN, api.MATERIAL_METAL)
    w2 = api.World(spheres=[api.Sphere((0, 0, -1), 0.5, api.Dielectric(1.5))])
    assert w2.texture_set == ()
    assert w2.static_ior == 1.5


def test_checker_parity_exact():
    even = _v3(1.0, 1.0, 1.0)
    odd = _v3(0.0, 0.0, 0.0)
    # scale 1: cell parity = floor(x)+floor(y)+floor(z).
    at = lambda x, y, z: float(
        checker_albedo(even, odd, jnp.float32(1.0), _v3(x, y, z)).x
    )
    assert at(0.5, 0.5, 0.5) == 1.0  # 0+0+0 even
    assert at(1.5, 0.5, 0.5) == 0.0  # 1 odd
    assert at(1.5, 1.5, 0.5) == 1.0  # 2 even
    assert at(-0.5, 0.5, 0.5) == 0.0  # floor(-0.5) = -1 → odd
    # scale 2 halves the cell size.
    assert float(
        checker_albedo(even, odd, jnp.float32(2.0), _v3(0.3, 0.1, 0.1)).x
    ) == 1.0
    assert float(
        checker_albedo(even, odd, jnp.float32(2.0), _v3(0.6, 0.1, 0.1)).x
    ) == 0.0


def test_value_noise_contract():
    # Range, determinism, and spatial variation on a grid of points.
    xs = jnp.linspace(-7.3, 9.1, 64)
    p = V3(xs, xs * 0.7 + 1.3, xs * -0.4 + 2.2)
    n1 = np.asarray(value_noise(p))
    n2 = np.asarray(value_noise(p))
    assert (n1 >= 0.0).all() and (n1 < 1.0).all()
    np.testing.assert_array_equal(n1, n2)  # pure function of position
    assert n1.std() > 0.05  # actually varies
    # Continuity across a lattice boundary: tiny step, tiny change.
    eps = 1e-4
    a = float(value_noise(_v3(1.0 - eps, 0.5, 0.5)))
    b = float(value_noise(_v3(1.0 + eps, 0.5, 0.5)))
    assert abs(a - b) < 1e-2
    t = np.asarray(turbulence(p))
    assert (t >= 0.0).all() and (t <= 1.0).all()


def test_triangle_wave_exact():
    xs = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0, -1.0, 0.5], jnp.float32)
    out = np.asarray(triangle_wave(xs))
    np.testing.assert_allclose(out, [1.0, 0.0, -1.0, 0.0, 1.0, 0.0, 0.5])
    assert (np.abs(out) <= 1.0).all()


CHECKER = api.Checker((0.9, 0.9, 0.9), (0.1, 0.3, 0.1), scale=2.0)


def _textured_world():
    return api.World(
        spheres=[
            api.Sphere((0, -100.5, -1), 100, api.Lambertian(CHECKER)),
            api.Sphere((0, 0, -1), 0.5, api.Lambertian(api.Marble((0.9, 0.8, 0.7), 4.0))),
            api.Sphere((1, 0, -1), 0.5, api.Metal((0.8, 0.8, 0.8), 0.1)),
        ],
    )


def test_compile_texture_rows():
    w = _textured_world()
    scene = compile_scene(w)
    tex = np.asarray(scene.tex_ty)
    assert tex[0] == api.TEXTURE_CHECKER and tex[1] == api.TEXTURE_MARBLE
    assert tex[2] == api.TEXTURE_SOLID and (tex[3:] == api.TEXTURE_SOLID).all()
    np.testing.assert_allclose(
        [float(scene.albedo2.x[0]), float(scene.albedo2.y[0]), float(scene.albedo2.z[0])],
        CHECKER.odd,
    )
    np.testing.assert_allclose(
        [float(scene.albedo.x[0]), float(scene.albedo.y[0]), float(scene.albedo.z[0])],
        CHECKER.even,
    )
    assert float(scene.tex_scale[0]) == 2.0 and float(scene.tex_scale[1]) == 4.0
    # Morton sort carries the rows with the spheres.
    many = api.World(
        spheres=[
            api.Sphere((i * 1.0, 0, -1), 0.1,
                       api.Lambertian(api.Checker((1, 1, 1), (0, 0, 0), scale=i + 1.0)))
            for i in range(70)
        ],
    )
    s2 = compile_scene(many, spatial_sort=True)
    # Each sphere's scale must still match its center.x + 1.
    cx = np.asarray(s2.center.x)[:70]
    sc = np.asarray(s2.tex_scale)[:70]
    order = np.argsort(cx)
    np.testing.assert_allclose(sc[order], np.arange(70) + 1.0)


def test_untextured_pytree_unchanged():
    w = api.World(spheres=[api.Sphere((0, 0, -1), 0.5, api.Lambertian((0.5, 0.5, 0.5)))])
    s = compile_scene(w)
    assert s.tex_ty is None and s.albedo2 is None and s.tex_scale is None


def test_hit_record_applies_checker():
    # A ray straight down onto the checkered ground plane of a big sphere:
    # the hit point is known, so the expected cell color is closed-form.
    w = api.World(
        spheres=[api.Sphere((0.0, -1000.0, 0.0), 1000.0, api.Lambertian(CHECKER))],
    )
    scene = compile_scene(w)
    for x, expect in ((0.1, CHECKER.even), (0.6, CHECKER.odd)):
        # floor(0.1*2)+floor(0*2)+floor(z*2) with z=0.1/0.6 like x:
        o = V3(jnp.float32([x]), jnp.float32([1.0]), jnp.float32([0.1]))
        d = V3(jnp.float32([0.0]), jnp.float32([-1.0]), jnp.float32([0.0]))
        hit = apply_texture(closest_hit(o, d, scene, 1e-3, 1e4))
        assert bool(hit.mask[0])
        got = [float(hit.albedo.x[0]), float(hit.albedo.y[0]), float(hit.albedo.z[0])]
        cell = (
            int(np.floor(x * 2)) + int(np.floor(float(hit.point.y[0]) * 2))
            + int(np.floor(0.1 * 2))
        )
        want = CHECKER.even if cell % 2 == 0 else CHECKER.odd
        np.testing.assert_allclose(got, want, atol=1e-6)
        del expect  # the closed-form cell decides (y lands at ~0)


def test_textured_mesh_renders():
    # Two triangles forming a ground quad with a checker; oracle render.
    quad = api.Mesh(
        vertices=[(-3, -0.5, -4), (3, -0.5, -4), (3, -0.5, 1), (-3, -0.5, 1)],
        triangles=[(0, 1, 2), (0, 2, 3)],
        material=api.Lambertian(CHECKER),
    )
    w = api.World(spheres=[api.Sphere((0, 0, -1.5), 0.5, api.Metal((0.9, 0.9, 0.9)))],
                  meshes=[quad])
    assert w.texture_set == (api.TEXTURE_CHECKER,)
    scene = compile_scene(w)
    assert scene.tris.tex_ty is not None
    r = make_renderer(w.camera, 48, 27, 4, 6)
    img, segs = r(scene, crng.key_from_seed(3), 0)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.std() > 0.02


@pytest.mark.slow
def test_kernel_texture_parity():
    """Pallas megakernel (interpret mode) matches the oracle on textured
    scenes — shared texture evaluation + exact record packing."""
    from myraytracer_tpu.kernels.trace import make_renderer as make_pallas

    w = _textured_world()
    scene = compile_scene(w)
    key = crng.key_from_seed(0)
    jr = make_renderer(w.camera, 16, 8, 2, 4, sample_batch=2)
    pr = make_pallas(
        w.camera, 16, 8, 2, 4, tile_rows=8, interpret=True,
        material_set=w.material_set, texture_set=w.texture_set,
    )
    a, sa = jr(scene, key, 0)
    b, sb = pr(scene, key, 0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)
    assert float(sa) == float(sb)


def test_kernel_texture_parity_single_family():
    """One-texture scenes exercise the 2-id decode branch (scale row
    carries no sign bit)."""
    from myraytracer_tpu.kernels.trace import make_renderer as make_pallas

    w = api.World(
        spheres=[
            api.Sphere((0, -100.5, -1), 100, api.Lambertian(CHECKER)),
            api.Sphere((0, 0, -1), 0.5, api.Lambertian((0.3, 0.5, 0.7))),
        ],
    )
    scene = compile_scene(w)
    key = crng.key_from_seed(1)
    jr = make_renderer(w.camera, 16, 8, 2, 4, sample_batch=2)
    pr = make_pallas(
        w.camera, 16, 8, 2, 4, tile_rows=8, interpret=True,
        material_set=w.material_set, texture_set=w.texture_set,
    )
    a, _ = jr(scene, key, 0)
    b, _ = pr(scene, key, 0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_kernel_textured_mesh_parity():
    from myraytracer_tpu.kernels.trace import make_renderer as make_pallas

    quad = api.Mesh(
        vertices=[(-3, -0.5, -4), (3, -0.5, -4), (3, -0.5, 1), (-3, -0.5, 1)],
        triangles=[(0, 1, 2), (0, 2, 3)],
        material=api.Lambertian(CHECKER),
    )
    w = api.World(
        spheres=[api.Sphere((0, 0, -1.5), 0.5,
                            api.Lambertian(api.Marble((0.9, 0.8, 0.7), 3.0)))],
        meshes=[quad],
    )
    scene = compile_scene(w)
    key = crng.key_from_seed(2)
    jr = make_renderer(w.camera, 16, 8, 2, 4, sample_batch=2)
    pr = make_pallas(
        w.camera, 16, 8, 2, 4, tile_rows=8, interpret=True,
        material_set=w.material_set, texture_set=w.texture_set,
    )
    a, sa = jr(scene, key, 0)
    b, sb = pr(scene, key, 0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)
    assert float(sa) == float(sb)


def test_kernel_texture_set_mismatch_raises():
    from myraytracer_tpu.kernels.trace import make_renderer as make_pallas

    w = _textured_world()
    scene = compile_scene(w)
    pr = make_pallas(
        w.camera, 16, 8, 1, 2, tile_rows=8, interpret=True,
        material_set=w.material_set,  # texture_set omitted
    )
    with pytest.raises(ValueError, match="texture_set"):
        pr(scene, crng.key_from_seed(0), 0)


@pytest.mark.slow
def test_textured_render_shows_pattern():
    # The checkered ground must produce a bimodal brightness distribution
    # in the lower image half (both cell colors visible).
    w = _textured_world()
    scene = compile_scene(w)
    r = make_renderer(w.camera, 96, 54, 8, 8)
    img = np.asarray(r(scene, crng.key_from_seed(0), 0)[0])
    # Same geometry with the checker collapsed to its even color: the
    # textured render must differ visibly on many pixels (odd cells) while
    # sharing the identical sample stream.
    w_even = api.World(
        spheres=(
            api.Sphere((0, -100.5, -1), 100, api.Lambertian(CHECKER.even)),
        ) + w.spheres[1:],
    )
    img_even = np.asarray(
        make_renderer(w_even.camera, 96, 54, 8, 8)(
            compile_scene(w_even), crng.key_from_seed(0), 0
        )[0]
    )
    delta = np.abs(img - img_even).max(axis=-1)
    assert (delta > 0.1).mean() > 0.05, "checker pattern not visible"
    # Texture never changes the sample stream: a solid-color scene with the
    # same geometry renders identically where both albedos coincide.
    w_solid = api.World(
        spheres=[
            api.Sphere((0, -100.5, -1), 100,
                       api.Lambertian(api.Checker((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))),
            api.Sphere((0, 0, -1), 0.5, api.Lambertian((0.5, 0.5, 0.5))),
        ],
    )
    w_plain = api.World(
        spheres=[
            api.Sphere((0, -100.5, -1), 100, api.Lambertian((0.5, 0.5, 0.5))),
            api.Sphere((0, 0, -1), 0.5, api.Lambertian((0.5, 0.5, 0.5))),
        ],
    )
    r1 = make_renderer(w_solid.camera, 32, 18, 4, 6)
    r2 = make_renderer(w_plain.camera, 32, 18, 4, 6)
    i1 = np.asarray(r1(compile_scene(w_solid), crng.key_from_seed(1), 0)[0])
    i2 = np.asarray(r2(compile_scene(w_plain), crng.key_from_seed(1), 0)[0])
    np.testing.assert_array_equal(i1, i2)


@pytest.mark.slow
def test_textured_session_pallas_matches_jnp():
    """End-to-end dispatch: a textured world on backend='pallas'
    (interpret mode off-TPU) blends the same frames as the jnp oracle —
    no more auto-downgrade for textured scenes."""
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.dispatch import make_session

    w = _textured_world()
    # frame_batch pinned: auto resolution differs per backend (pallas
    # batches ~64 samples/call), so one step() would blend different
    # sample counts — a sampling difference, not a renderer one.
    cfg = RenderConfig(width=16, height=8, samples_per_frame=2, ray_depth=4,
                       frame_batch=1)
    a = make_session(w, cfg)
    b = make_session(w, cfg.replace(backend="pallas"))
    fa = np.asarray(a.step())
    fb = np.asarray(b.step())
    np.testing.assert_allclose(fb, fa, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_textured_sharded_parity():
    """Tile-sharded textured render is bitwise the unsharded one (the
    texture rows reach each device's block via the replicated scene)."""
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.dispatch import make_session

    w = _textured_world()
    cfg = RenderConfig(width=16, height=8, samples_per_frame=2, ray_depth=4)
    a = make_session(w, cfg)
    b = make_session(w, cfg.replace(shard="tiles"))
    np.testing.assert_array_equal(np.asarray(a.step()), np.asarray(b.step()))


def test_textured_adaptive_session():
    """AdaptiveSession accepts textured worlds (texture_set threads to
    the factory; the oracle ignores it and reads the scene rows)."""
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.adaptive import AdaptiveSession

    w = _textured_world()
    cfg = RenderConfig(width=64, height=32, samples_per_frame=2, ray_depth=4)
    s = AdaptiveSession(w, cfg, n_sel=2)
    s.step()
    img = np.asarray(s.framebuffer)
    assert np.isfinite(img).all() and img.std() > 0.0


def test_textured_metal_parity_and_effect():
    """Checker-tinted Metal: the kernel matches the oracle, and the
    reflection tint really varies across the mirror (both backends read
    the texture at the hit point, material-agnostic)."""
    from myraytracer_tpu.kernels.trace import make_renderer as make_pallas

    w = api.World(
        spheres=[
            api.Sphere((0, -100.5, -1), 100, api.Metal(CHECKER)),
            api.Sphere((0, 0, -1), 0.5, api.Lambertian((0.7, 0.3, 0.3))),
        ],
    )
    assert w.texture_set == (api.TEXTURE_CHECKER,)
    scene = compile_scene(w)
    key = crng.key_from_seed(4)
    jr = make_renderer(w.camera, 32, 16, 2, 4, sample_batch=2)
    pr = make_pallas(
        w.camera, 32, 16, 2, 4, tile_rows=16, interpret=True,
        material_set=w.material_set, texture_set=w.texture_set,
    )
    a, sa = jr(scene, key, 0)
    b, sb = pr(scene, key, 0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)
    assert float(sa) == float(sb)
    # Lower half shows the checkered mirror: clearly bimodal brightness.
    low = np.asarray(a)[10:, :, 1]
    assert low.std() > 0.05


# -- Image (bitmap) textures (round 3; RTiOW book-2 ch. 4 analog) -----------


def _quadrant_image():
    """2x2 texel map with distinct colors per quadrant."""
    return np.asarray(
        [[[1, 0, 0], [0, 1, 0]],   # top row (v near 1)
         [[0, 0, 1], [1, 1, 0]]],  # bottom row (v near 0)
        np.float32,
    )


def test_sphere_uv_known_points():
    from myraytracer_tpu.core.vec import V3
    from myraytracer_tpu.render.textures import sphere_uv

    pts = V3(
        jnp.asarray([1.0, -1.0, 0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 0.0, 1.0, -1.0, 0.0]),
        jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.0]),
    )
    u, v = sphere_uv(pts)
    # (1,0,0) -> u=0.5 v=0.5; (-1,0,0) -> u in {0,1}; north pole v=1,
    # south pole v=0; (0,0,1) -> u=0.25 (book ch. 4.2 worked examples).
    np.testing.assert_allclose(np.asarray(u)[[0, 4]], [0.5, 0.25], atol=1e-6)
    assert np.asarray(u)[1] in (0.0, 1.0)
    np.testing.assert_allclose(np.asarray(v), [0.5, 0.5, 1.0, 0.0, 0.5],
                               atol=1e-6)


def test_image_albedo_quadrants():
    from myraytracer_tpu.core.vec import V3
    from myraytracer_tpu.render.textures import image_albedo

    img = jnp.asarray(_quadrant_image())
    # u<0.5,v>0.5 -> texel [0,0] red; u>0.5,v>0.5 -> [0,1] green;
    # u<0.5,v<0.5 -> [1,0] blue; u>0.5,v<0.5 -> [1,1] yellow.
    north = 0.5  # y>0 -> v>0.5
    out = V3(
        jnp.asarray([1.0, -1.0, 1.0, -1.0]),
        jnp.asarray([north, north, -north, -north]),
        jnp.asarray([0.9, -0.9, 0.9, -0.9]),  # u<0.5 for z>0 side etc.
    ).normalize()
    c = image_albedo(img, jnp.float32(1.0), out)
    got = np.stack([np.asarray(c.x), np.asarray(c.y), np.asarray(c.z)], -1)
    assert got.shape == (4, 3)
    # Each sampled direction lands on one distinct quadrant color.
    assert {tuple(row) for row in got.round(3)} <= {
        (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0)
    }
    assert len({tuple(row) for row in got.round(3)}) >= 3


def test_earth_scene_renders_with_distinct_regions():
    """End-to-end: the earth preset renders on the jnp integrator with
    visibly distinct texels (ocean/land/caps) on the globe."""
    world = presets.earth_scene()
    scene = compile_scene(world)
    assert scene.tex_image is not None
    r = make_renderer(world.camera, 48, 27, 4, 4, sample_batch=4)
    img, _ = r(scene, KEY, 0)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # The globe fills the view center; hue variance across it must be
    # real (a broken lookup collapses to one color).
    center = img[6:21, 12:36]
    assert center.std(axis=(0, 1)).max() > 0.03


def test_image_texture_api_validation(tmp_path):
    from myraytracer_tpu.scene.api import (
        ImageTexture, Lambertian, Mesh, Sphere, World,
    )
    from myraytracer_tpu.scene.compile import compile_scene as cs
    from myraytracer_tpu.scene.meshgen import quad

    with pytest.raises(ValueError, match=r"\[H, W, 3\]"):
        ImageTexture(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError, match="finite"):
        ImageTexture(np.full((2, 2, 3), np.nan, np.float32))

    img_a = ImageTexture(_quadrant_image())
    img_b = ImageTexture(_quadrant_image() * 0.5)
    # Two distinct images: rejected (single bitmap operand per scene).
    with pytest.raises(ValueError, match="one ImageTexture"):
        cs(World(spheres=[
            Sphere((0, 0, 0), 1.0, Lambertian(img_a)),
            Sphere((3, 0, 0), 1.0, Lambertian(img_b)),
        ]))
    # The same image twice is fine (content equality).
    scene = cs(World(spheres=[
        Sphere((0, 0, 0), 1.0, Lambertian(img_a)),
        Sphere((3, 0, 0), 1.0, Lambertian(ImageTexture(_quadrant_image()))),
    ]))
    assert scene.tex_image.shape == (2, 2, 3)
    # Meshes carry no UVs.
    with pytest.raises(ValueError, match="sphere UVs only"):
        cs(World(spheres=[], meshes=[
            Mesh(*quad((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)),
                 Lambertian(img_a)),
        ]))


def test_image_texture_kernel_rejection_and_fingerprint():
    """The megakernel rejects image-textured scenes loudly; sessions on
    the jnp path work, and the scene fingerprint covers the bitmap."""
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.kernels.trace import (
        make_renderer as make_pallas_renderer,
    )
    from myraytracer_tpu.render.session import RenderSession

    world = presets.earth_scene()
    with pytest.raises(NotImplementedError, match="image textures"):
        make_pallas_renderer(
            world.camera, 16, 8, 1, 2, interpret=True, texture_set=(1, 3),
        )

    cfg = RenderConfig(width=16, height=8, samples_per_frame=1,
                       ray_depth=2, backend="jnp")
    s = RenderSession(world, cfg)
    s.step()
    assert np.asarray(s.framebuffer).max() > 0

    # A different bitmap is a different world: fingerprints must differ
    # (a resumed checkpoint would otherwise blend two different earths).
    from myraytracer_tpu.scene.api import ImageTexture, Lambertian, Sphere, World

    def fp(img):
        w2 = World(
            spheres=[Sphere((0.0, 2.0, 0.0), 2.0,
                            Lambertian(ImageTexture(img)))],
            camera=world.camera,
        )
        return RenderSession(w2, cfg).scene_fingerprint

    assert fp(_quadrant_image()) != fp(_quadrant_image() * 0.5)
