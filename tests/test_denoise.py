"""Edge-avoiding à-trous denoiser (render/denoise.py).

Contracts under test:
* feature pass: sky lanes get (albedo 1, depth t_max); hit lanes carry
  the texture-evaluated albedo and the shading normal;
* exact identity on a constant signal with uniform features (the filter
  is a normalized weighted mean — a constant is a fixed point);
* edge preservation: a two-region synthetic image with a feature edge
  keeps its region means while in-region noise shrinks;
* quality: denoised low-spp render has lower RMSE against a high-spp
  reference of the same stream than the raw framebuffer;
* determinism: same inputs → bitwise-same output; the checkpoint holds
  the RAW accumulation (denoise is an output transform);
* CLI: --denoise writes a different image than the raw run from the
  identical accumulation state.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.render.denoise import (
    Denoiser,
    atrous_denoise,
    aux_buffers,
)
from myraytracer_tpu.render.session import RenderSession
from myraytracer_tpu.render import camera as cam_mod
from myraytracer_tpu.scene import presets
from myraytracer_tpu.scene.compile import compile_scene

W, H = 96, 48


def _aux(world, w=W, h=H, t_max=1e4):
    scene = compile_scene(world)
    gen = cam_mod.make_ray_generator(world.camera, w, h)
    return aux_buffers(scene, gen, w, h, 1e-3, t_max)


def test_aux_buffers_sky_and_hits():
    world = presets.reference_scene()  # fixed camera, 4 spheres
    albedo, normal, depth = _aux(world)
    assert albedo.shape == (H, W, 3) and depth.shape == (H, W)
    a, d = np.asarray(albedo), np.asarray(depth)
    n = np.asarray(normal)
    sky = d >= 1e4
    assert sky.any() and (~sky).any()
    # Sky: demodulation-neutral albedo.
    assert np.all(a[sky] == 1.0)
    # Normals are unit everywhere (hit normals and sky's -d alike).
    assert np.allclose((n * n).sum(-1), 1.0, atol=1e-4)
    # The reference camera looks down -Z; the image center hits the
    # red center sphere (albedo 0.7, 0.3, 0.3 — lib.rs:692-696).
    center = a[H // 2, W // 2]
    assert np.allclose(center, [0.7, 0.3, 0.3], atol=1e-5)


def test_aux_buffers_textured_albedo():
    world = presets.get_scene("texture", seed=0)  # checker ground
    albedo, _, depth = _aux(world)
    a, d = np.asarray(albedo), np.asarray(depth)
    hit = d < 1e4
    # A checkered surface yields at least two distinct albedo values.
    vals = np.unique(np.round(a[hit], 4), axis=0)
    assert len(vals) >= 2


def test_constant_image_is_fixed_point():
    fb = jnp.full((H, W, 3), 0.37, jnp.float32)
    albedo = jnp.ones((H, W, 3), jnp.float32)
    normal = jnp.tile(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (H, W, 1))
    depth = jnp.ones((H, W), jnp.float32)
    out = np.asarray(atrous_denoise(fb, albedo, normal, depth, 3))
    np.testing.assert_allclose(out, 0.37, rtol=1e-6)


def test_edge_preserved_noise_removed():
    rng = np.random.default_rng(7)
    left = np.s_[:, : W // 2]
    right = np.s_[:, W // 2:]
    fb = np.empty((H, W, 3), np.float32)
    fb[left] = 0.2
    fb[right] = 0.9
    noisy = fb + rng.normal(0.0, 0.08, fb.shape).astype(np.float32)
    albedo = np.ones((H, W, 3), np.float32)
    # Feature edge between the halves: opposing normals + a depth step.
    normal = np.zeros((H, W, 3), np.float32)
    normal[left] = (0.0, 0.0, 1.0)
    normal[right] = (1.0, 0.0, 0.0)
    depth = np.full((H, W), 2.0, np.float32)
    depth[right] = 6.0
    out = np.asarray(atrous_denoise(
        jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal),
        jnp.asarray(depth), 4,
    ))
    # In-region noise shrinks substantially...
    inner_l = np.s_[8:-8, 8: W // 2 - 8]
    inner_r = np.s_[8:-8, W // 2 + 8: -8]
    for sl, mean in ((inner_l, 0.2), (inner_r, 0.9)):
        raw_std = float(noisy[sl].std())
        dn_std = float(out[sl].std())
        assert dn_std < raw_std * 0.35, (raw_std, dn_std)
        # ...while the region mean is preserved (no cross-edge bleed).
        assert abs(float(out[sl].mean()) - mean) < 0.02


def test_denoise_improves_low_spp_rmse():
    world = presets.three_sphere_scene()
    cfg = RenderConfig(
        width=W, height=H, samples_per_frame=4, ray_depth=6, backend="jnp",
    )
    s = RenderSession(world, cfg)
    low = np.asarray(s.run(1))  # 4 spp
    for _ in range(23):
        s.step()
    ref = np.asarray(s.framebuffer)  # 96 spp, same stream
    dn = Denoiser(world, W, H)
    out = np.asarray(dn(low, s.scene.cam))
    rmse = lambda a, b: float(np.sqrt(np.mean((a - b) ** 2)))
    r_raw, r_dn = rmse(low, ref), rmse(out, ref)
    assert r_dn < 0.8 * r_raw, (r_raw, r_dn)
    # Determinism: the filter is a pure function.
    again = np.asarray(dn(low, s.scene.cam))
    np.testing.assert_array_equal(out, again)


def test_denoiser_tracks_runtime_camera():
    world = presets.get_scene("defocus", seed=0)  # general-mode camera
    dn = Denoiser(world, W, H)
    cam0 = jnp.asarray(cam_mod.pack_camera(world.camera, W, H))
    a0 = np.asarray(dn._features(cam0)[2])
    moved = cam_mod.orbit_camera(world.camera, 0.8, 0.1, 1.0)
    cam1 = jnp.asarray(cam_mod.pack_camera(moved, W, H))
    a1 = np.asarray(dn._features(cam1)[2])
    assert not np.array_equal(a0, a1)  # features followed the camera


def test_cli_denoise_output_differs_checkpoint_raw(tmp_path):
    from myraytracer_tpu import cli

    common = [
        "--width", "64", "--height", "32", "--samples-per-frame", "2",
        "--ray-depth", "4", "--frames", "2", "--scene", "three-sphere",
        "--backend", "jnp",
    ]
    raw_png = tmp_path / "raw.png"
    dn_png = tmp_path / "dn.png"
    ck_a = tmp_path / "a.npz"
    ck_b = tmp_path / "b.npz"
    assert cli.main(common + [
        "--out", str(raw_png), "--checkpoint", str(ck_a),
    ]) == 0
    assert cli.main(common + [
        "--denoise", "--out", str(dn_png), "--checkpoint", str(ck_b),
    ]) == 0
    # Same accumulation state (denoise touches no sample stream)...
    a, b = np.load(ck_a), np.load(ck_b)
    np.testing.assert_array_equal(a["framebuffer"], b["framebuffer"])
    # ...different output image.
    assert raw_png.read_bytes() != dn_png.read_bytes()


def test_cli_denoise_live_viewer_toggle_keeps_session(tmp_path):
    """A /?denoise=N query during --serve swaps the output filter in
    place: NO session rebuild (the accumulation stream continues) and
    the frame budget is not restarted. ?denoise=0 turns it back off."""
    import urllib.request

    from myraytracer_tpu import cli
    from myraytracer_tpu import viewer as viewer_mod

    out = tmp_path / "served.png"
    captured = {}
    real_init = viewer_mod.LiveViewer.__init__

    def vinit(self, port, *a, **kw):
        real_init(self, port, *a, **kw)
        captured["viewer"] = self

    real_sinit = RenderSession.__init__
    real_step = RenderSession.step
    counts = {"sessions": 0, "steps": 0}

    def sinit(self, *a, **kw):
        counts["sessions"] += 1
        real_sinit(self, *a, **kw)

    def step(self):
        counts["steps"] += 1
        if counts["steps"] in (2, 4):
            q = "denoise=2" if counts["steps"] == 2 else "denoise=0"
            with urllib.request.urlopen(
                f"http://127.0.0.1:{captured['viewer'].port}/?{q}"
            ) as r:
                r.read()
        return real_step(self)

    viewer_mod.LiveViewer.__init__ = vinit
    RenderSession.__init__ = sinit
    RenderSession.step = step
    try:
        rc = cli.main([
            "--width", "64", "--height", "32", "--samples-per-frame", "2",
            "--ray-depth", "4", "--frames", "6", "--scene", "three-sphere",
            "--backend", "jnp", "--serve", "0", "--out", str(out),
        ])
    finally:
        RenderSession.step = real_step
        RenderSession.__init__ = real_sinit
        viewer_mod.LiveViewer.__init__ = real_init
    assert rc == 0
    # One session for the whole run: both toggles swapped the filter
    # without the page-reload rebuild path...
    assert counts["sessions"] == 1
    # ...and the frame budget was not restarted by either toggle.
    assert counts["steps"] == 6


def test_cli_denoise_live_toggle_adaptive(tmp_path):
    """/?denoise=N during --adaptive --serve swaps the output filter
    (display transform) while scene/size queries stay rejected — the
    schedule state is untouched. /stats.json reports the active count."""
    import time
    import urllib.request

    from myraytracer_tpu import cli
    from myraytracer_tpu import viewer as viewer_mod
    from myraytracer_tpu.render.adaptive import AdaptiveSession

    out = tmp_path / "served.png"
    captured = {}
    real_init = viewer_mod.LiveViewer.__init__

    def vinit(self, port, *a, **kw):
        real_init(self, port, *a, **kw)
        captured["viewer"] = self

    real_step = AdaptiveSession.step
    calls = {"n": 0}

    def step(self):
        calls["n"] += 1
        if calls["n"] == 1:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{captured['viewer'].port}/?denoise=2"
            ) as r:
                r.read()
        # Slow each round past the viewer sync cadence so the toggle is
        # consumed deterministically on the next push.
        time.sleep(0.3)
        return real_step(self)

    viewer_mod.LiveViewer.__init__ = vinit
    AdaptiveSession.step = step
    try:
        rc = cli.main([
            "--width", "64", "--height", "32", "--samples-per-frame", "2",
            "--ray-depth", "4", "--frames", "6", "--scene", "three-sphere",
            "--backend", "jnp", "--adaptive", "--serve", "0",
            "--out", str(out),
        ])
    finally:
        AdaptiveSession.step = real_step
        viewer_mod.LiveViewer.__init__ = real_init
    assert rc == 0
    assert calls["n"] >= 2  # the toggle did not end the schedule
    # The final stats push reports the toggled filter.
    assert captured["viewer"]._stats["denoise"] == 2


def test_cli_denoise_composes_with_adaptive(tmp_path):
    from myraytracer_tpu import cli

    out = tmp_path / "adn.png"
    assert cli.main([
        "--width", "64", "--height", "32", "--samples-per-frame", "2",
        "--ray-depth", "4", "--frames", "4", "--scene", "three-sphere",
        "--backend", "jnp", "--adaptive", "--denoise", "--out", str(out),
    ]) == 0
    from myraytracer_tpu.output.image import read_png

    img = read_png(str(out))
    assert img.shape == (32, 64, 3)
    assert img.mean() > 1.0  # nonzero content


def test_auto_iterations_matches_measured_ladder():
    """The --denoise auto schedule reproduces the measured optima
    (BENCH.md "Denoising"): full support at the lowest counts, the
    16-spp optimum of 2 iterations, pass-through past the crossover."""
    from myraytracer_tpu.render.denoise import (
        AUTO_CROSSOVER_SPP,
        auto_iterations,
    )

    assert auto_iterations(1) == 5
    assert auto_iterations(4) == 4
    assert auto_iterations(8) == 3
    assert auto_iterations(16) == 2  # the measured 16-spp optimum
    assert auto_iterations(32) == 1
    assert auto_iterations(AUTO_CROSSOVER_SPP) == 0
    assert auto_iterations(500) == 0
    # Monotone non-increasing in spp; never above the default.
    prev = 99
    for spp in range(1, 130):
        it = auto_iterations(spp)
        assert 0 <= it <= 5 and it <= prev
        prev = it


def test_denoiser_auto_mode_is_noise_driven():
    """Round-5 auto contract: the iteration count follows the
    framebuffer's own measured noise, not the accumulated spp — a clean
    image passes through raw at ANY spp; a noisy one filters hard; the
    reported effective count tracks what the last call actually did."""
    from myraytracer_tpu.render.denoise import estimate_noise, noise_iterations

    world = presets.reference_scene()
    dn = Denoiser(world, W, H, auto=True)
    rng = np.random.default_rng(0)

    # Clean (smooth gradient) image: ~zero noise -> exact pass-through,
    # even at a "low spp" hint.
    ramp = jnp.asarray(
        np.linspace(0.1, 0.6, H * W * 3).reshape(H, W, 3), jnp.float32
    )
    out_clean = dn(ramp, spp=4)
    np.testing.assert_array_equal(np.asarray(out_clean), np.asarray(ramp))
    assert dn.effective_iterations() == 0

    # Heavy noise: the filter runs with deep support, even at a high
    # spp hint (an accumulation can still be noisy — emissive scenes).
    noisy = jnp.asarray(rng.random((H, W, 3)), jnp.float32) * 0.8
    out_noisy = np.asarray(dn(noisy, spp=4096))
    assert not np.array_equal(out_noisy, np.asarray(noisy))
    assert dn.effective_iterations() >= 3

    # The scalar pieces: estimator orders by noise level; the schedule
    # is monotone in it and clamped to [0, 5].
    assert estimate_noise(ramp) < estimate_noise(noisy)
    prev = 0
    for n in (0.0, 0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.3):
        it = noise_iterations(n)
        assert 0 <= it <= 5 and it >= prev
        prev = it
    assert noise_iterations(0.0) == 0 and noise_iterations(0.3) == 5

    # Before any call, effective_iterations(spp) falls back to the spp
    # ladder (UI previews).
    fresh = Denoiser(world, W, H, auto=True)
    assert fresh.effective_iterations(4) == 4
    assert fresh.effective_iterations(4096) == 0


def test_cli_denoise_auto_sharpens_to_raw(tmp_path):
    """--denoise auto (noise-driven since round 5): a short noisy run
    filters its output; a deeply-converged run writes the RAW image
    (bitwise equal to the no-denoise run — the measured noise sits
    under the schedule's anchor) while a fixed --denoise 2 run still
    filters."""
    from myraytracer_tpu import cli

    # 320x180: the smallest size where the noise estimator's aliased-
    # detail floor sits below the schedule anchor (the documented
    # small-image caveat, BENCH.md "Denoising at production size").
    common = [
        "--width", "320", "--height", "180", "--ray-depth", "4",
        "--scene", "three-sphere", "--backend", "jnp",
    ]
    raw, auto_lo, auto_hi, fixed = (
        tmp_path / n for n in ("raw.png", "lo.png", "hi.png", "fx.png")
    )
    # 2 frames x 4 spp = 8 accumulated spp: noisy -> auto filters.
    assert cli.main(common + [
        "--samples-per-frame", "4", "--frames", "2",
        "--out", str(raw)]) == 0
    assert cli.main(common + [
        "--samples-per-frame", "4", "--frames", "2",
        "--denoise", "auto", "--out", str(auto_lo)]) == 0
    assert raw.read_bytes() != auto_lo.read_bytes()
    # 16 frames x 16 spp = 256 accumulated spp: converged -> auto = raw,
    # a fixed iteration count still filters.
    deep = ["--samples-per-frame", "16", "--frames", "16"]
    raw_deep = tmp_path / "raw_deep.png"
    assert cli.main(common + deep + ["--out", str(raw_deep)]) == 0
    assert cli.main(common + deep + [
        "--denoise", "auto", "--out", str(auto_hi)]) == 0
    assert cli.main(common + deep + [
        "--denoise", "2", "--out", str(fixed)]) == 0
    assert auto_hi.read_bytes() == raw_deep.read_bytes()
    assert fixed.read_bytes() != raw_deep.read_bytes()


def test_auto_noise_estimate_cached_by_spp():
    """The ~50 ms noise estimate is reused while spp grows < 25% and
    re-measured when spp jumps or moves backwards (orbit restart)."""
    from myraytracer_tpu.render import denoise as dn_mod

    world = presets.reference_scene()
    dn = Denoiser(world, W, H, auto=True)
    rng = np.random.default_rng(1)
    fb = jnp.asarray(rng.random((H, W, 3)), jnp.float32)

    calls = []
    real = dn_mod.estimate_noise

    def counting(x):
        calls.append(1)
        return real(x)

    dn_mod.estimate_noise = counting
    try:
        dn(fb, spp=100)
        assert len(calls) == 1
        dn(fb, spp=110)  # +10%: cached
        assert len(calls) == 1
        dn(fb, spp=130)  # +30%: re-estimated
        assert len(calls) == 2
        dn(fb, spp=4)  # backwards (restart): re-estimated
        assert len(calls) == 3
    finally:
        dn_mod.estimate_noise = real


def test_feature_cache_keys_on_camera_values():
    """The per-camera feature cache keys on the packed VALUES: a
    value-equal copy (new object, new id) hits the cache, a moved
    camera misses — id() recycling across orbit loops can never serve
    a stale view's features."""
    world = presets.get_scene("defocus", seed=0)
    dn = Denoiser(world, W, H)
    cam0 = jnp.asarray(cam_mod.pack_camera(world.camera, W, H))

    f0 = dn._features(cam0)
    cam_copy = jnp.asarray(np.array(np.asarray(cam0)))  # new object/id
    assert cam_copy is not cam0
    f1 = dn._features(cam_copy)
    assert f1 is f0  # value-equal -> cache hit (same tuple object)
    moved = cam_mod.orbit_camera(world.camera, 0.5, 0.1, 1.0)
    f2 = dn._features(jnp.asarray(cam_mod.pack_camera(moved, W, H)))
    assert f2 is not f0  # different values -> recomputed
