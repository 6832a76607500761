"""CLI surface: reference flag semantics plus the run-forever mode and
the env backend override (native-runner/src/main.rs:4-43; lib.rs:187-196,
322)."""

import numpy as np
import pytest

from myraytracer_tpu import cli
from myraytracer_tpu.output.image import read_png
from myraytracer_tpu.render.session import RenderSession


BASE = ["--width", "16", "--height", "8", "--samples-per-frame", "1",
        "--ray-depth", "2", "--scene", "reference", "--backend", "jnp"]


def test_cli_renders_and_writes(tmp_path):
    out = tmp_path / "out.png"
    rc = cli.main(BASE + ["--frames", "2", "--out", str(out)])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (8, 16, 3)
    assert img.max() > 0


def test_cli_run_forever_interrupt_writes(tmp_path, monkeypatch):
    """--frames 0 accumulates until interrupted (lib.rs:187-196), then the
    final image still lands in --out."""
    out = tmp_path / "forever.png"
    real_step = RenderSession.step
    calls = {"n": 0}

    def step(self):
        calls["n"] += 1
        if calls["n"] > 3:
            raise KeyboardInterrupt
        return real_step(self)

    monkeypatch.setattr(RenderSession, "step", step)
    rc = cli.main(BASE + ["--frames", "0", "--out", str(out)])
    assert rc == 0
    assert calls["n"] == 4
    assert read_png(out).shape == (8, 16, 3)


def test_cli_env_backend_override(tmp_path, monkeypatch):
    out = tmp_path / "env.png"
    argv = [a for a in BASE if a not in ("--backend", "jnp")]
    monkeypatch.setenv("MYRT_BACKEND", "jnp")
    assert cli.main(argv + ["--frames", "1", "--out", str(out)]) == 0
    assert read_png(out).shape == (8, 16, 3)

    monkeypatch.setenv("MYRT_BACKEND", "bogus")
    with pytest.raises(SystemExit):
        cli.main(argv + ["--frames", "1", "--out", str(out)])

    # an explicit --backend flag wins over the env (only auto defers)
    monkeypatch.setenv("MYRT_BACKEND", "bogus")
    assert cli.main(BASE + ["--frames", "1", "--out", str(out)]) == 0


def test_cli_env_log_override(tmp_path, monkeypatch):
    """MYRT_LOG sets the level when --log-level is absent (the reference's
    RUST_LOG/env_logger contract, native-runner/src/main.rs:6-9); an
    explicit flag wins; a bogus value dies loudly."""
    import logging

    seen = []
    monkeypatch.setattr(
        logging, "basicConfig", lambda **kw: seen.append(kw.get("level"))
    )
    out = tmp_path / "log.png"
    monkeypatch.setenv("MYRT_LOG", "warning")
    assert cli.main(BASE + ["--frames", "1", "--out", str(out)]) == 0
    assert seen[-1] == logging.WARNING

    # flag beats env
    assert cli.main(BASE + ["--frames", "1", "--log-level", "debug",
                            "--out", str(out)]) == 0
    assert seen[-1] == logging.DEBUG

    monkeypatch.setenv("MYRT_LOG", "bogus")
    with pytest.raises(SystemExit):
        cli.main(BASE + ["--frames", "1", "--out", str(out)])


def test_cli_url_query_rebuilds_session(tmp_path):
    """A /?param= page load rebuilds the session mid-run with the merged
    config (the reference web runner's Args-from-query, lib.rs:72-94)."""
    import urllib.request

    out = tmp_path / "served.png"

    # Drive the viewer from a thread: grab the viewer instance via the
    # LiveViewer constructor, push a session request after frame 1.
    from myraytracer_tpu import viewer as viewer_mod

    captured = {}
    real_init = viewer_mod.LiveViewer.__init__

    def init(self, port, *a, **kw):
        real_init(self, port, *a, **kw)
        captured["viewer"] = self

    viewer_mod.LiveViewer.__init__ = init
    try:
        real_step = RenderSession.step
        calls = {"n": 0}

        def step(self):
            calls["n"] += 1
            if calls["n"] == 2:
                # simulate /?width=24&height=12 between frames
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{captured['viewer'].port}"
                    f"/?width=24&height=12&samples_per_frame=2"
                ) as r:
                    r.read()
            return real_step(self)

        RenderSession.step = step
        try:
            rc = cli.main(BASE + [
                "--frames", "4", "--serve", "0", "--out", str(out),
            ])
        finally:
            RenderSession.step = real_step
        assert rc == 0
        # the rebuilt session rendered at the requested size
        assert read_png(out).shape == (12, 24, 3)
    finally:
        viewer_mod.LiveViewer.__init__ = real_init


def test_cli_adaptive_shard_tiles_renders(tmp_path):
    """--adaptive --shard tiles: per-device block stripes through the
    CLI path (round 4; the virtual 8-device CPU mesh)."""
    out = tmp_path / "ad.png"
    rc = cli.main([
        "--width", "256", "--height", "128", "--samples-per-frame", "1",
        "--ray-depth", "2", "--scene", "reference", "--backend", "jnp",
        "--shard", "tiles", "--adaptive", "8", "--frames", "4",
        "--out", str(out),
    ])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (128, 256, 3)
    assert img.max() > 0


def test_cli_adaptive_serve_progress(tmp_path):
    """--adaptive --serve: the browser viewer shows adaptive progress
    (round 4). The final framebuffer and round/spp stats are published;
    query-string session rebuilds are ignored (state is schedule-bound)."""
    import json
    import urllib.request

    from myraytracer_tpu import viewer as viewer_mod

    out = tmp_path / "served.png"
    captured = {}
    real_init = viewer_mod.LiveViewer.__init__

    def init(self, port, *a, **kw):
        real_init(self, port, *a, **kw)
        captured["viewer"] = self

    viewer_mod.LiveViewer.__init__ = init
    try:
        rc = cli.main(BASE + [
            "--adaptive", "--frames", "4", "--serve", "0",
            "--out", str(out),
        ])
        assert rc == 0
        port = captured["viewer"].port
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats.json"
        ) as r:
            stats = json.loads(r.read())
        # "frame" carries the adaptive round count; spp is the budget mean.
        assert stats["width"] == 16 and stats["height"] == 8
        assert stats["frame"] > 0 and stats["spp"] > 0
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.png"
        ) as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        captured["viewer"].close()
    finally:
        viewer_mod.LiveViewer.__init__ = real_init
    assert read_png(out).shape == (8, 16, 3)


def test_cli_adaptive_resume_inherits_window(tmp_path):
    """A resumed adaptive run with auto --frame-batch inherits the
    checkpoint's window count F instead of re-deriving it (the schedule
    cadence is provenance; auto would pick a different F from this
    run's budget and refuse the resume)."""
    ck = str(tmp_path / "a.npz")
    out = str(tmp_path / "a.png")
    args = ["--width", "256", "--height", "128", "--samples-per-frame",
            "1", "--ray-depth", "2", "--scene", "reference", "--backend",
            "jnp", "--adaptive", "8", "--out", out]
    assert cli.main(args + ["--frames", "4", "--frame-batch", "2",
                            "--checkpoint", ck]) == 0
    # No --frame-batch here: auto on jnp would be F=1 != saved F=2.
    assert cli.main(args + ["--frames", "2", "--resume", ck]) == 0
    assert read_png(out).shape == (128, 256, 3)


def test_cli_interactive_orbit_with_denoise(tmp_path):
    """--serve --interactive end-to-end through cli.main: a /set orbit
    request mid-run repacks the runtime camera (set_camera), and
    --denoise composes (the feature pass follows the moved camera on
    the next viewer push)."""
    import time
    import urllib.request

    from myraytracer_tpu import viewer as viewer_mod

    out = tmp_path / "served.png"
    captured = {}
    real_init = viewer_mod.LiveViewer.__init__

    def vinit(self, port, *a, **kw):
        real_init(self, port, *a, **kw)
        captured["viewer"] = self

    real_step = RenderSession.step
    real_setcam = RenderSession.set_camera
    calls = {"step": 0, "setcam": 0}

    def step(self):
        calls["step"] += 1
        if calls["step"] == 2:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{captured['viewer'].port}"
                f"/set?yaw=0.5&pitch=0.1&dist=1.2"
            ) as r:
                r.read()
        # Outlast the 0.25 s viewer sync cadence so every frame pushes
        # (and polls the camera) deterministically.
        time.sleep(0.3)
        return real_step(self)

    def setcam(self, cam):
        calls["setcam"] += 1
        return real_setcam(self, cam)

    viewer_mod.LiveViewer.__init__ = vinit
    RenderSession.step = step
    RenderSession.set_camera = setcam
    try:
        rc = cli.main([
            "--width", "32", "--height", "16", "--samples-per-frame", "1",
            "--ray-depth", "2", "--frames", "5", "--scene", "defocus",
            "--backend", "jnp", "--serve", "0", "--interactive",
            "--denoise", "2", "--out", str(out),
        ])
    finally:
        RenderSession.step = real_step
        RenderSession.set_camera = real_setcam
        viewer_mod.LiveViewer.__init__ = real_init
    assert rc == 0
    assert calls["setcam"] == 1  # the orbit was applied exactly once
    assert read_png(out).shape == (16, 32, 3)


def test_cli_adaptive_interactive_orbit(tmp_path):
    """--adaptive --serve --interactive: a /set orbit mid-run restarts
    the adaptive schedule under the moved camera (round-5 composition;
    previously banned). The session's statistics reset, the bootstrap
    re-arms, and the run still completes its (restarted) budget."""
    import time
    import urllib.request

    from myraytracer_tpu import viewer as viewer_mod
    from myraytracer_tpu.render.adaptive import AdaptiveSession

    out = tmp_path / "adaptive_orbit.png"
    captured = {}
    real_init = viewer_mod.LiveViewer.__init__

    def vinit(self, port, *a, **kw):
        real_init(self, port, *a, **kw)
        captured["viewer"] = self

    from myraytracer_tpu.render.denoise import Denoiser

    real_step = AdaptiveSession.step
    real_setcam = AdaptiveSession.set_camera
    real_call = Denoiser.__call__
    calls = {"step": 0, "setcam": 0}
    dn_cams = []

    def dcall(self, fb, cam=None, spp=None):
        dn_cams.append(None if cam is None else np.asarray(cam).copy())
        return real_call(self, fb, cam, spp=spp)

    def step(self):
        calls["step"] += 1
        if calls["step"] == 2:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{captured['viewer'].port}"
                f"/set?yaw=0.4&pitch=0.1&dist=1.1"
            ) as r:
                r.read()
        time.sleep(0.3)  # outlast the 0.25 s viewer sync cadence
        return real_step(self)

    def setcam(self, cam):
        calls["setcam"] += 1
        assert self.samples_spent > 0  # mid-run, not at startup
        real_setcam(self, cam)
        assert self.samples_spent == 0 and self.rounds == 0
        assert not self.bootstrapped

    viewer_mod.LiveViewer.__init__ = vinit
    AdaptiveSession.step = step
    AdaptiveSession.set_camera = setcam
    Denoiser.__call__ = dcall
    try:
        rc = cli.main([
            "--width", "64", "--height", "32", "--samples-per-frame", "1",
            "--ray-depth", "2", "--frames", "4", "--scene", "defocus",
            "--backend", "jnp", "--adaptive", "--serve", "0",
            "--interactive", "--denoise", "1", "--out", str(out),
        ])
    finally:
        AdaptiveSession.step = real_step
        AdaptiveSession.set_camera = real_setcam
        Denoiser.__call__ = real_call
        viewer_mod.LiveViewer.__init__ = real_init
    assert rc == 0
    assert calls["setcam"] == 1
    # The denoiser's guide features must FOLLOW the orbit: every post()
    # passes the session's runtime camera, and the final call's camera
    # differs from the first (pre-orbit) one.
    assert dn_cams and all(c is not None for c in dn_cams)
    assert not np.array_equal(dn_cams[0], dn_cams[-1])
    assert read_png(out).shape == (32, 64, 3)


def test_cli_adaptive_composition_bans(tmp_path):
    out = str(tmp_path / "x.png")
    for extra in (
        ["--shard", "samples"],
        ["--shard", "hybrid"],
        ["--serve", "0", "--interactive"],
        ["--frames", "0"],
    ):
        with pytest.raises(SystemExit):
            cli.main(BASE + ["--adaptive", "--frames", "2", "--out", out]
                     + extra)


def test_cli_ambient_override(tmp_path):
    """--ambient replaces the sky: black ambient + no emitters = an
    all-black image (the sky was the only light source); a colored
    ambient re-lights the scene."""
    out = tmp_path / "amb.png"
    rc = cli.main(BASE + ["--frames", "1", "--ambient", "0,0,0",
                          "--out", str(out)])
    assert rc == 0
    assert read_png(out).max() == 0
    rc = cli.main(BASE + ["--frames", "1", "--ambient", "1,0.5,0.25",
                          "--out", str(out)])
    assert rc == 0
    img = read_png(out)
    assert img.max() > 0
    # The R>B ambient tint dominates the frame's illumination.
    assert img[..., 0].mean() > img[..., 2].mean()


def test_cli_ambient_rejects_bad_input(tmp_path):
    with pytest.raises(SystemExit):
        cli.main(BASE + ["--frames", "1", "--ambient", "0,0",
                         "--out", str(tmp_path / "x.png")])
    with pytest.raises(SystemExit):
        cli.main(BASE + ["--frames", "1", "--ambient", "a,b,c",
                         "--out", str(tmp_path / "x.png")])


def test_cli_rejects_negative_frames(tmp_path):
    with pytest.raises(SystemExit):
        cli.main(BASE + ["--frames", "-3", "--out", str(tmp_path / "x.png")])


def test_cli_rejects_negative_denoise(tmp_path):
    """Negative --denoise must be an argparse error: -1 is strictly the
    internal viewer sentinel for auto mode, and lower values would reach
    Denoiser(iterations<0) as a raw traceback."""
    for bad in ("-1", "-3", "five"):
        with pytest.raises(SystemExit):
            cli.main(BASE + ["--denoise", bad,
                             "--out", str(tmp_path / "x.png")])


def test_cli_adaptive_rejects_bad_aov_up_front(tmp_path, monkeypatch):
    """--adaptive with a bad --aov list must fail before rendering (the
    old path validated only in _write_aovs, after the budget was spent)."""
    from myraytracer_tpu.render import adaptive as adaptive_mod

    def boom(*a, **k):  # the render must never start
        raise AssertionError("AdaptiveSession built before --aov validation")

    monkeypatch.setattr(adaptive_mod, "AdaptiveSession", boom)
    with pytest.raises(SystemExit):
        cli.main(BASE + ["--adaptive", "0", "--frames", "2",
                         "--aov", "albedo,bogus",
                         "--out", str(tmp_path / "x.png")])


def test_auto_frame_batch_never_overshoots_frames():
    """--frames 100 at spp 1 must render exactly 100 frames (2x50), not
    round a 64-frame auto batch up to 128."""
    from myraytracer_tpu.config import RenderConfig

    cfg = RenderConfig(samples_per_frame=1, max_frames=100)
    fb = cfg.resolve_frame_batch("pallas")
    steps = -(-100 // fb)
    assert steps * fb == 100
    # Overshoot is bounded by steps-1 frames (the ceil split), never by
    # a whole 64-frame batch; divisible counts are exact.
    for frames in (1, 2, 7, 63, 64, 65, 128, 1000):
        fb = RenderConfig(samples_per_frame=1,
                          max_frames=frames).resolve_frame_batch("pallas")
        steps = -(-frames // fb)
        assert 0 <= steps * fb - frames < steps
    for frames in (64, 128, 192, 100):
        fb = RenderConfig(samples_per_frame=1,
                          max_frames=frames).resolve_frame_batch("pallas")
        assert -(-frames // fb) * fb == frames


def test_cli_aov_outputs(tmp_path):
    """--aov writes albedo/normal/depth next to --out from the
    deterministic primary-hit feature pass (cli._write_aovs)."""
    import numpy as np

    from myraytracer_tpu import cli
    from myraytracer_tpu.output.image import read_pfm, read_png

    common = [
        "--width", "64", "--height", "32", "--samples-per-frame", "1",
        "--ray-depth", "2", "--frames", "1", "--scene", "reference",
        "--backend", "jnp",
    ]
    out = tmp_path / "r.png"
    assert cli.main(common + [
        "--out", str(out), "--aov", "albedo,normal,depth"]) == 0
    alb = read_png(str(tmp_path / "r.albedo.png"))
    nrm = read_png(str(tmp_path / "r.normal.png"))
    dep = read_png(str(tmp_path / "r.depth.png"))
    assert alb.shape == nrm.shape == dep.shape == (32, 64, 3)
    # Reference scene center: the red sphere (0.7, 0.3, 0.3), linear u8.
    np.testing.assert_allclose(
        alb[16, 32] / 255.0, [0.7, 0.3, 0.3], atol=1.5 / 255.0
    )
    # Its center normal faces the camera (+Z): encoded (n+1)/2 ≈ (.5,.5,1)
    # (the pixel center sits ~half a pixel off the sphere axis, so the
    # x/y components are small but nonzero).
    np.testing.assert_allclose(
        nrm[16, 32] / 255.0, [0.5, 0.5, 1.0], atol=0.05
    )
    # Sky pixels exist and their depth t/(1+t) saturates to ~1.
    assert (dep[..., 0] == 255).any()
    # HDR sink: raw values (signed normals, t in world units).
    out2 = tmp_path / "r.pfm"
    assert cli.main(common + [
        "--out", str(out2), "--aov", "normal,depth"]) == 0
    nrm_f = read_pfm(tmp_path / "r.normal.pfm")
    dep_f = read_pfm(tmp_path / "r.depth.pfm")
    assert nrm_f.shape == (32, 64, 3) and dep_f.shape == (32, 64)
    np.testing.assert_allclose(nrm_f[16, 32], [0, 0, 1], atol=0.1)
    assert (dep_f == 1e4).any()  # sky = t_max
    assert 0.5 < dep_f[16, 32] < 2.0  # center sphere ~1 unit away


def test_cli_aov_rejects_unknown_channel(tmp_path):
    import pytest

    from myraytracer_tpu import cli

    with pytest.raises(SystemExit):
        cli.main([
            "--width", "16", "--height", "8", "--samples-per-frame", "1",
            "--ray-depth", "2", "--frames", "1", "--backend", "jnp",
            "--out", str(tmp_path / "x.png"), "--aov", "beauty",
        ])


def test_cli_adaptive_interrupt_writes_final_image(tmp_path):
    """Ctrl-C mid-adaptive-run falls through to the final image write
    (the uniform loop's graceful-interrupt contract, round 5)."""
    from myraytracer_tpu.render.adaptive import AdaptiveSession

    out = tmp_path / "int.png"
    real_step = AdaptiveSession.step
    calls = {"n": 0}

    def step(self):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt
        return real_step(self)

    AdaptiveSession.step = step
    try:
        rc = cli.main(BASE + [
            "--adaptive", "0", "--frames", "64", "--out", str(out),
        ])
    finally:
        AdaptiveSession.step = real_step
    assert rc == 0
    from myraytracer_tpu.output.image import read_png

    assert read_png(out).shape[2] == 3
