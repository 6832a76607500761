"""Adaptive sampling (render/adaptive.py + kernels/trace.make_adaptive_renderer).

Contracts under test:
* the Pallas adaptive renderer matches the jnp adaptive oracle bitwise
  (interpret mode), including sentinel padding and per-block cursors;
* an adaptive render of a block is bitwise a uniform render of that block
  at the same per-pixel sample window (scheduling independence of the
  RNG streams);
* AdaptiveSession reallocates budget toward high-variance blocks and
  beats the uniform estimator's error at equal sample budget on a
  mixed-variance scene (deterministic: fixed seeds on CPU).
"""

import pytest

import numpy as np
import jax.numpy as jnp

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.kernels import trace as ktrace
from myraytracer_tpu.render.adaptive import (
    AdaptiveSession,
    block_geometry,
    make_adaptive_oracle,
)
from myraytracer_tpu.render.integrator import (
    make_renderer as make_jnp_renderer,
)
from myraytracer_tpu.scene import presets
from myraytracer_tpu.scene.compile import compile_scene

KEY = crng.key_from_seed(0)
TILE_ROWS = 8  # block 64x16 in tests (DEFAULT is 64x32)
BLOCK_W = ktrace.DEFAULT_CONFIG.BLOCK_W
BLOCK_H = TILE_ROWS * ktrace.LANES // BLOCK_W


def _renderers(world, w, h, n_sel, spp, depth):
    scene = compile_scene(world)
    mats = tuple(sorted({s.material.type_id for s in world.spheres})) or None
    kern = ktrace.make_adaptive_renderer(
        world.camera, w, h, n_sel, spp, depth,
        tile_rows=TILE_ROWS, interpret=True, material_set=mats,
    )
    import jax

    oracle = jax.jit(make_adaptive_oracle(
        world.camera, w, h, n_sel, spp, depth,
        block_w=BLOCK_W, block_h=BLOCK_H,
    ))
    return scene, kern, oracle


@pytest.mark.slow
def test_kernel_matches_oracle_with_cursors_and_sentinel():
    w, h, spp, depth = 100, 24, 2, 4  # 2x2 block grid, ragged edges
    world = presets.three_sphere_scene()
    bx, by, nb = block_geometry(w, h, BLOCK_W, BLOCK_H)
    assert (bx, by) == (2, 2)
    scene, kern, oracle = _renderers(world, w, h, 4, spp, depth)
    ids = jnp.asarray([3, 0, nb, 2], jnp.uint32)  # scattered + sentinel
    samp0 = jnp.asarray([4, 0, 0, 10], jnp.uint32)  # per-block cursors
    got, segs_k = kern(scene, KEY, ids, samp0)
    want, segs_o = oracle(scene, KEY, ids, samp0)
    # Same stream, cross-compiled paths: the documented kernel-vs-oracle
    # envelope (tests/test_pallas.py uses the same tolerances).
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )
    assert float(segs_k) == float(segs_o)  # exact integer counts
    # The sentinel row contributed nothing.
    assert np.all(np.asarray(got)[2] == 0.0)


@pytest.mark.slow
def test_adaptive_block_equals_uniform_render_of_same_window():
    """Scheduling independence: block sums at cursor s0 equal the uniform
    full-frame renderer's sample window [s0, s0+spp) on those pixels."""
    w, h, spp, depth = 100, 24, 3, 4
    world = presets.reference_scene()
    bx, by, nb = block_geometry(w, h, BLOCK_W, BLOCK_H)
    scene, kern, _ = _renderers(world, w, h, nb, spp, depth)
    s0 = 5
    ids = jnp.arange(nb, dtype=jnp.uint32)
    got, _ = kern(scene, KEY, ids, jnp.full((nb,), s0, jnp.uint32))
    uniform = make_jnp_renderer(
        world.camera, w, h, spp, depth, sample_batch=spp
    )
    img, _ = uniform(scene, KEY, s0)  # per-pixel MEAN over the window
    want_sum = np.asarray(img) * spp
    # Assemble the block sums into an image.
    full = np.zeros((by * BLOCK_H, bx * BLOCK_W, 3), np.float32)
    g = np.asarray(got)
    for i in range(nb):
        r, c = divmod(i, bx)
        full[
            r * BLOCK_H : (r + 1) * BLOCK_H, c * BLOCK_W : (c + 1) * BLOCK_W
        ] = g[i]
    # Kernel vs jnp oracle: the documented cross-path envelope, scaled
    # by the sample-count of the sums.
    np.testing.assert_allclose(
        full[:h, :w], want_sum, rtol=1e-5, atol=1e-6 * spp
    )


@pytest.mark.slow
def test_session_reallocates_and_beats_uniform_error():
    # Top blocks are pure sky (near-zero variance); bottom blocks hold
    # fuzzy metal + glass. 128x64 => 2x2 blocks of 64x32 (default tiles).
    w, h, spp, depth = 128, 64, 4, 8
    world = presets.three_sphere_scene()
    cfg = RenderConfig(
        width=w, height=h, samples_per_frame=spp, ray_depth=depth,
        backend="jnp", seed=3,
    )
    sess = AdaptiveSession(world, cfg, n_sel=1)
    assert sess.n_blocks == 4
    budget_frames = 16
    fb_adaptive = np.asarray(sess.run_budget(budget_frames))
    smap = sess.spp_map
    assert smap.min() >= 2 * spp  # bootstrap covered everything twice
    assert smap.max() > smap.min()  # and the budget skewed afterwards
    spent = sess.samples_spent
    assert spent <= budget_frames * spp * w * h

    # Uniform estimator at the full budget (adaptive spent at most this).
    uniform = make_jnp_renderer(
        world.camera, w, h, budget_frames * spp, depth, sample_batch=8
    )
    scene = sess.scene
    img_u, _ = uniform(scene, crng.key_from_seed(3), 0)
    # High-spp reference for the error comparison (different seed).
    ref = make_jnp_renderer(world.camera, w, h, 256, depth, sample_batch=8)
    img_r, _ = ref(scene, crng.key_from_seed(99), 0)
    rmse_a = float(np.sqrt(np.mean((fb_adaptive - np.asarray(img_r)) ** 2)))
    rmse_u = float(np.sqrt(np.mean((np.asarray(img_u) - np.asarray(img_r)) ** 2)))
    # The adaptive session spent AT MOST the uniform budget (usually
    # less) and must still come out ahead on this mixed-variance scene.
    assert rmse_a < rmse_u, (rmse_a, rmse_u, spent)


@pytest.mark.slow
def test_session_pallas_interpret_matches_oracle_session():
    """The same adaptive schedule on both backends produces the same
    framebuffer (within the documented cross-compiler envelope)."""
    w, h, spp, depth = 128, 32, 2, 4
    world = presets.reference_scene()
    cfg = RenderConfig(
        width=w, height=h, samples_per_frame=spp, ray_depth=depth, seed=1,
        frame_batch=1,  # pin F: auto picks per-backend (1 jnp, knee pallas)
    )
    a = AdaptiveSession(world, cfg.replace(backend="jnp"), n_sel=2)
    b = AdaptiveSession(
        world, cfg.replace(backend="pallas"), n_sel=2, interpret=True
    )
    for s in (a, b):
        s.bootstrap()
        s.step()
    np.testing.assert_allclose(
        np.asarray(a.framebuffer), np.asarray(b.framebuffer), atol=2e-6
    )
    np.testing.assert_array_equal(a.spp_map, b.spp_map)


def test_windowed_rounds_match_single_rounds_bitwise():
    """F sub-windows per call fold into the statistics exactly as F
    separate rounds (same cursors, same sample windows, same fold order)
    — the frame-batching composition changes throughput, not results."""
    w, h, spp = 128, 64, 2
    world = presets.three_sphere_scene()
    cfg = RenderConfig(
        width=w, height=h, samples_per_frame=spp, ray_depth=4,
        backend="jnp", seed=5,
    )
    a = AdaptiveSession(world, cfg.replace(frame_batch=3), n_sel=2)
    assert a.windows == 3
    b = AdaptiveSession(world, cfg, n_sel=2)
    assert b.windows == 1
    a.bootstrap(covers=3)  # one pass: F=3 sub-rounds per block
    b.bootstrap(covers=3)  # three passes of single rounds
    for sa, sb in zip(a._state, b._state):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    assert a.rounds == b.rounds
    assert a.samples_spent == b.samples_spent


@pytest.mark.slow
def test_windowed_kernel_matches_oracle_session():
    """The Pallas adaptive kernel's window buckets (multi-frame scratch
    under adaptive prefetch operands) match the oracle's windowed rounds."""
    w, h, spp = 128, 32, 2
    world = presets.reference_scene()
    cfg = RenderConfig(
        width=w, height=h, samples_per_frame=spp, ray_depth=4, seed=1,
        frame_batch=2,
    )
    a = AdaptiveSession(world, cfg.replace(backend="jnp"), n_sel=2)
    b = AdaptiveSession(
        world, cfg.replace(backend="pallas"), n_sel=2, interpret=True
    )
    assert a.windows == b.windows == 2
    for s in (a, b):
        s.bootstrap()
        s.step()
    np.testing.assert_allclose(
        np.asarray(a.framebuffer), np.asarray(b.framebuffer), atol=2e-6
    )
    np.testing.assert_array_equal(a.spp_map, b.spp_map)


def test_auto_window_policy():
    """Auto F targets the measured ~128-sample-window knee on the Pallas
    path (BENCH.md F-sweep: spp 8 → F 16 and spp 32 → F 4 both peak at
    window 128), stays 1 on the jnp oracle (no regeneration tail to
    amortize), caps at the 64-frame kernel bucket limit, and bounds the
    bootstrap to ~1/4 of a bounded budget. Explicit frame_batch wins."""
    C = RenderConfig
    assert C(samples_per_frame=8).resolve_adaptive_windows("pallas") == 16
    assert C(samples_per_frame=32).resolve_adaptive_windows("pallas") == 4
    assert C(samples_per_frame=1).resolve_adaptive_windows("pallas") == 64
    assert C(samples_per_frame=256).resolve_adaptive_windows("pallas") == 1
    assert C(samples_per_frame=8).resolve_adaptive_windows("jnp") == 1
    assert C(samples_per_frame=8,
             max_frames=20).resolve_adaptive_windows("pallas") == 5
    assert C(samples_per_frame=8, max_frames=2,
             ).resolve_adaptive_windows("pallas") == 1
    assert C(samples_per_frame=8,
             frame_batch=3).resolve_adaptive_windows("pallas") == 3
    assert C(samples_per_frame=8,
             frame_batch=3).resolve_adaptive_windows("jnp") == 3


def test_adaptive_checkpoint_resume_exact(tmp_path):
    """An adaptive checkpoint round-trips the full per-block state: the
    resumed session continues the identical sample streams and selection
    schedule (state bitwise-equal to an uninterrupted run)."""
    w, h, spp = 128, 64, 2
    world = presets.three_sphere_scene()
    cfg = RenderConfig(width=w, height=h, samples_per_frame=spp,
                       ray_depth=4, backend="jnp", seed=5)

    # Uninterrupted run: bootstrap + 3 steps.
    a = AdaptiveSession(world, cfg, n_sel=2)
    a.bootstrap()
    for _ in range(3):
        a.step()

    # Interrupted at bootstrap+1, checkpointed, resumed, continued.
    b = AdaptiveSession(world, cfg, n_sel=2)
    b.bootstrap()
    b.step()
    path = tmp_path / "a.npz"
    b.save_checkpoint(path)
    c = AdaptiveSession(world, cfg, n_sel=2)
    c.load_checkpoint(path)
    assert c._bootstrapped  # resumed past the bootstrap
    assert c.rounds == b.rounds and c.samples_spent == b.samples_spent
    for _ in range(2):
        c.step()

    for sa, sc in zip(a._state, c._state):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sc))
    np.testing.assert_array_equal(
        np.asarray(a.framebuffer), np.asarray(c.framebuffer)
    )


def test_adaptive_checkpoint_provenance(tmp_path):
    w, h = 128, 64
    world = presets.three_sphere_scene()
    cfg = RenderConfig(width=w, height=h, samples_per_frame=2,
                       ray_depth=4, backend="jnp", seed=5)
    s = AdaptiveSession(world, cfg, n_sel=2)
    s.bootstrap()
    path = tmp_path / "a.npz"
    s.save_checkpoint(path)

    # Mismatched knobs refuse loudly.
    with pytest.raises(ValueError, match="n_sel"):
        AdaptiveSession(world, cfg, n_sel=1).load_checkpoint(path)
    with pytest.raises(ValueError, match="windows"):
        AdaptiveSession(world, cfg.replace(frame_batch=2),
                        n_sel=2).load_checkpoint(path)
    with pytest.raises(ValueError, match="scene"):
        AdaptiveSession(presets.reference_scene(), cfg,
                        n_sel=2).load_checkpoint(path)
    with pytest.raises(ValueError, match="rr"):
        AdaptiveSession(world, cfg.replace(rr=3),
                        n_sel=2).load_checkpoint(path)

    # A uniform session must refuse the adaptive npz and vice versa.
    from myraytracer_tpu.render.session import RenderSession

    with pytest.raises(ValueError):
        RenderSession(world, cfg).load_checkpoint(path)
    u = RenderSession(world, cfg)
    u.step()
    upath = tmp_path / "u.npz"
    u.save_checkpoint(upath)
    with pytest.raises(ValueError, match="adaptive"):
        s.load_checkpoint(upath)


def test_adaptive_checkpoint_preserves_orbited_camera(tmp_path):
    """A checkpoint saved after a set_camera orbit must resume under the
    ORBITED camera (the state describes that view), not the construction
    camera — the RenderSession 'camera' contract, extended to adaptive
    sessions for the round-5 --interactive composition."""
    import numpy as np

    from myraytracer_tpu.render.adaptive import AdaptiveSession
    from myraytracer_tpu.render.camera import orbit_camera
    from myraytracer_tpu.scene import presets

    world = presets.get_scene("defocus", seed=0)  # general camera
    cfg = RenderConfig(
        width=64, height=32, samples_per_frame=2, ray_depth=3,
        backend="jnp",
    )
    s = AdaptiveSession(world, cfg, n_sel=1)
    s.bootstrap()
    s.set_camera(orbit_camera(world.camera, 0.7, 0.2, 1.1))
    s.bootstrap()
    moved_cam = np.asarray(s.scene.cam)
    path = tmp_path / "orbit.npz"
    s.save_checkpoint(path)

    s2 = AdaptiveSession(world, cfg, n_sel=1)
    construction_cam = np.asarray(s2.scene.cam)
    assert not np.array_equal(construction_cam, moved_cam)
    s2.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(s2.scene.cam), moved_cam)
    # And the resumed state keeps accumulating under that camera.
    s2.step()
    assert s2.samples_spent > s.samples_spent - 1
