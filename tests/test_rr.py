"""Russian-roulette termination (``RenderConfig.rr``): unbiasedness,
path-length reduction, kernel/oracle parity, stream independence, and
checkpoint provenance."""

import numpy as np
import pytest

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.render.integrator import make_renderer
from myraytracer_tpu.render.session import RenderSession
from myraytracer_tpu.scene import presets
from myraytracer_tpu.scene.compile import compile_scene

KEY = crng.key_from_seed(0)


def test_rr_unbiased_against_full_depth():
    """Same scene (hollow glass — the deep-chain case RR exists for):
    the RR estimator's mean matches full-depth tracing within sampling
    noise, despite tracing fewer segments (measured 0.83x at rr=3 on this
    open scene; the enclosed-scene test below shows the big cut)."""
    world = presets.three_sphere_scene()
    scene = compile_scene(world)
    base = make_renderer(world.camera, 24, 16, 256, 24, sample_batch=8)
    rr = make_renderer(world.camera, 24, 16, 256, 24, sample_batch=8, rr=3)
    a, segs_a = base(scene, KEY, 0)
    b, segs_b = rr(scene, KEY, 0)
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(b).all() and (b >= 0).all()
    assert abs(b.mean() - a.mean()) < 0.04 * a.mean()
    assert np.abs(b - a).mean() < 0.2 * a.mean()
    # The point of RR: the deep tail shrinks.
    assert float(segs_b) < 0.88 * float(segs_a), (float(segs_b), float(segs_a))


def test_rr_big_cut_on_enclosed_scene():
    """Enclosed high-albedo scenes are where the tail dominates: cornell
    paths survive to full depth without RR. Measured 0.55x segments at
    rr=4 with mean shift ~0.2% (depth 24, 64 spp)."""
    world = presets.cornell_scene()
    scene = compile_scene(world)
    kw = dict(sky=world.ambient, sample_batch=8)
    a, segs_a = make_renderer(world.camera, 24, 16, 64, 24, **kw)(
        scene, KEY, 0)
    b, segs_b = make_renderer(world.camera, 24, 16, 64, 24, rr=4, **kw)(
        scene, KEY, 0)
    assert float(segs_b) < 0.65 * float(segs_a), (float(segs_b), float(segs_a))
    a, b = np.asarray(a), np.asarray(b)
    assert abs(b.mean() - a.mean()) < 0.05 * max(a.mean(), 1e-6)


def test_rr_composes_with_nee():
    from myraytracer_tpu.render.lights import extract_lights

    world = presets.light_scene()
    scene = compile_scene(world)
    kw = dict(sky=world.ambient, sample_batch=8,
              nee_lights=extract_lights(world))
    a, _ = make_renderer(world.camera, 16, 8, 256, 12, **kw)(scene, KEY, 0)
    b, _ = make_renderer(world.camera, 16, 8, 256, 12, rr=3, **kw)(
        scene, KEY, 0)
    a, b = np.asarray(a), np.asarray(b)
    assert abs(b.mean() - a.mean()) < 0.05 * max(a.mean(), 1e-6)


def test_rr_beyond_depth_is_bitwise_noop():
    """rr > ray_depth never fires: the image must be bitwise the rr=0
    render — the decision stream rides a derived key, so merely enabling
    the code path shifts nothing (core/rng.py RR_KEY_FOLD contract)."""
    world = presets.three_sphere_scene()
    scene = compile_scene(world)
    base = make_renderer(world.camera, 16, 8, 4, 6, sample_batch=4)
    noop = make_renderer(world.camera, 16, 8, 4, 6, sample_batch=4, rr=7)
    a, sa = base(scene, KEY, 0)
    b, sb = noop(scene, KEY, 0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(sa) == float(sb)


def test_rr_kernel_oracle_parity():
    from myraytracer_tpu.kernels.trace import (
        make_renderer as make_pallas_renderer,
    )

    world = presets.three_sphere_scene()
    scene = compile_scene(world)
    jr = make_renderer(world.camera, 16, 8, 4, 10, sample_batch=4, rr=3)
    pr = make_pallas_renderer(world.camera, 16, 8, 4, 10, tile_rows=8,
                              interpret=True, rr=3)
    a, sa = jr(scene, KEY, 0)
    b, sb = pr(scene, KEY, 0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-6)
    assert float(sa) == float(sb)  # identical kill decisions


def test_rr_deep_depth_kernel_oracle_parity():
    """RR decision draws page with the bounce key past MAX_DEPTH
    (core/rng.py): both backends must take identical kill decisions."""
    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.kernels.trace import (
        make_renderer as make_pallas_renderer,
    )

    world = presets.three_sphere_scene()
    scene = compile_scene(world)
    depth = crng.MAX_DEPTH + 6
    jr = make_renderer(world.camera, 16, 8, 2, depth, sample_batch=2, rr=3)
    pr = make_pallas_renderer(world.camera, 16, 8, 2, depth, tile_rows=8,
                              interpret=True, rr=3)
    a, sa = jr(scene, KEY, 0)
    b, sb = pr(scene, KEY, 0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-6)
    assert float(sa) == float(sb)


def test_rr_session_cli_and_checkpoint_provenance(tmp_path):
    cfg = RenderConfig(width=16, height=8, samples_per_frame=2,
                       ray_depth=8, backend="jnp", rr=3)
    s = RenderSession(presets.three_sphere_scene(), cfg)
    s.step()
    path = tmp_path / "rr.npz"
    s.save_checkpoint(path)
    other = RenderSession(presets.three_sphere_scene(), cfg.replace(rr=0))
    with pytest.raises(ValueError, match="rr"):
        other.load_checkpoint(path)
    same = RenderSession(presets.three_sphere_scene(), cfg)
    same.load_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(s.framebuffer), np.asarray(same.framebuffer)
    )

    # CLI wiring.
    from myraytracer_tpu.cli import build_parser

    args = build_parser().parse_args(["--rr", "5"])
    assert args.rr == 5


def test_rr_tile_sharded_bitwise():
    from myraytracer_tpu.parallel.sharding import make_tile_sharded_renderer

    world = presets.three_sphere_scene()
    scene = compile_scene(world)
    single = make_renderer(world.camera, 16, 12, 4, 8, sample_batch=4, rr=3)
    want, _ = single(scene, KEY, 0)
    sharded = make_tile_sharded_renderer(
        world.camera, 16, 12, 4, 8, sample_batch=4, rr=3
    )
    got, _ = sharded(scene, KEY, 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
