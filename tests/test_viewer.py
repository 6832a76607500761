"""Live-viewer HTTP surface (the analog of the reference's browser runner,
index.html:22-36 / wasm-runner/src/lib.rs:47-94 — here the browser views a
host-side render loop instead of hosting it)."""

import json
import urllib.request

import numpy as np

from myraytracer_tpu.output.image import read_png
from myraytracer_tpu.viewer import LiveViewer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.read(), r.headers.get("Content-Type")


def test_viewer_serves_page_frame_and_stats(tmp_path):
    viewer = LiveViewer(0, gamma=2.0)  # port 0: pick a free port
    try:
        fb = np.zeros((4, 6, 3), np.float32)
        fb[..., 0] = 0.25  # gamma-2 encode -> 0.5 -> ~127
        viewer.update(fb, frame=3, spp=12)

        page, ctype = _get(viewer.port, "/")
        assert b"frame.png" in page and ctype.startswith("text/html")

        stats, ctype = _get(viewer.port, "/stats.json")
        assert ctype == "application/json"
        s = json.loads(stats)
        assert s == {"frame": 3, "spp": 12, "width": 6, "height": 4,
                     "denoise": 0, "denoise_auto": False}

        png, ctype = _get(viewer.port, "/frame.png?f=3")
        assert ctype == "image/png"
        p = tmp_path / "frame.png"
        p.write_bytes(png)
        img = read_png(p)
        assert img.shape == (4, 6, 3)
        assert int(img[0, 0, 0]) in (127, 128) and img[0, 0, 1] == 0
    finally:
        viewer.close()


def test_viewer_404():
    viewer = LiveViewer(0)
    try:
        try:
            _get(viewer.port, "/nope")
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        viewer.close()


def test_viewer_camera_controls():
    viewer = LiveViewer(0)
    try:
        assert viewer.pending_camera() is None
        _get(viewer.port, "/set?yaw=0.5&pitch=-0.25&dist=1.5")
        _get(viewer.port, "/set?yaw=0.7&pitch=-0.25&dist=1.5")  # latest wins
        req = viewer.pending_camera()
        assert req == {"yaw": 0.7, "pitch": -0.25, "dist": 1.5}
        assert viewer.pending_camera() is None  # consumed
        try:
            _get(viewer.port, "/set?yaw=bogus")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        viewer.close()


def test_orbit_camera():
    import math

    from myraytracer_tpu.render.camera import orbit_camera
    from myraytracer_tpu.scene.api import Camera

    base = Camera(lookfrom=(3.0, 0.0, 0.0), lookat=(0.0, 0.0, 0.0),
                  vfov_degrees=40.0)
    # half-turn in yaw lands on the opposite side, same radius
    c = orbit_camera(base, math.pi, 0.0, 1.0)
    np.testing.assert_allclose(c.lookfrom, (-3.0, 0.0, 0.0), atol=1e-12)
    # distance scaling
    c2 = orbit_camera(base, 0.0, 0.0, 2.0)
    np.testing.assert_allclose(c2.lookfrom, (6.0, 0.0, 0.0), atol=1e-12)
    # pitch clamps short of the pole
    c3 = orbit_camera(base, 0.0, 10.0, 1.0)
    assert abs(c3.lookfrom[1] - 3.0 * math.sin(1.45)) < 1e-9
    assert c3.lookat == base.lookat and c3.vfov_degrees == base.vfov_degrees


def test_viewer_url_query_session_params():
    """Render parameters parse from the URL query like the reference web
    runner (wasm-runner/src/lib.rs:72-77,87-94)."""
    viewer = LiveViewer(0)
    try:
        assert viewer.pending_session() is None
        _get(viewer.port, "/?width=320&height=180&samples_per_frame=4"
                          "&scene=final&seed=7")
        req = viewer.pending_session()
        assert req == {"width": 320, "height": 180, "samples_per_frame": 4,
                       "scene": "final", "seed": 7}
        assert viewer.pending_session() is None  # consumed
        # a plain page load queues nothing
        _get(viewer.port, "/")
        assert viewer.pending_session() is None
        # malformed values are a 400, not a crash
        try:
            _get(viewer.port, "/?width=bogus")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        viewer.close()


def test_viewer_bounds_rejected():
    """Absurd magnitudes are a 400 at the HTTP layer and never reach the
    serving loop — a stray tab must not trigger an unbounded recompile or
    allocation (viewer.SESSION_BOUNDS)."""
    import urllib.error

    viewer = LiveViewer(0)
    try:
        for query in (
            "/?width=16384",
            "/?height=-1",
            "/?samples_per_frame=10000",
            "/?samples_per_frame=0",
            "/?ray_depth=2000",
            "/?max_framebuffer_weight=2.5",
        ):
            try:
                _get(viewer.port, query)
                assert False, f"expected 400 for {query}"
            except urllib.error.HTTPError as e:
                assert e.code == 400, query
            assert viewer.pending_session() is None, query
        # In-bounds requests still queue.
        _get(viewer.port, "/?width=4096&height=512")
        assert viewer.pending_session() == {"width": 4096, "height": 512}
    finally:
        viewer.close()


def test_viewer_merged_config_bounds():
    """validate_config_bounds rejects over-budget *merged* configs — the
    per-parameter bounds alone admit 4096x4096 = 4x the pixel budget."""
    import pytest

    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.viewer import validate_config_bounds

    validate_config_bounds(RenderConfig(width=2048, height=2048))
    with pytest.raises(ValueError, match="pixels"):
        validate_config_bounds(RenderConfig(width=4096, height=4096))
    # Depths past the old 62 cap are now legal (paged draw keys,
    # core/rng.py); only the viewer's cost bound (1024) rejects.
    validate_config_bounds(RenderConfig(width=64, height=64, ray_depth=63))
    with pytest.raises(ValueError, match="ray_depth"):
        validate_config_bounds(
            RenderConfig(width=64, height=64, ray_depth=2000)
        )
    # 0-means-derive stays legal and resolves within budget.
    validate_config_bounds(RenderConfig(width=0, height=0))


def test_viewer_follow_window_roundtrip():
    """?width=0&height=0 = follow the window: the page measures the
    viewport client-side (script in _PAGE) and the server skips the
    both-zero request so only the concrete re-navigation rebuilds."""
    viewer = LiveViewer(0)
    try:
        page, _ = _get(viewer.port, "/?width=0&height=0")
        assert b"location.replace" in page  # the measuring script
        assert viewer.pending_session() is None  # both-zero skipped
        # other params in the same query still apply on the first pass
        _get(viewer.port, "/?width=0&height=0&scene=final")
        assert viewer.pending_session() == {"scene": "final"}
        # the concrete re-navigation queues normally
        _get(viewer.port, "/?width=800&height=600&scene=final")
        assert viewer.pending_session() == {
            "width": 800, "height": 600, "scene": "final"
        }
        # one-zero (square rule) is not the follow-window case: it queues
        _get(viewer.port, "/?width=0&height=256")
        assert viewer.pending_session() == {"width": 0, "height": 256}
    finally:
        viewer.close()


def test_viewer_log_level_query():
    """?log_level= adjusts the process log level (lib.rs:49-67 parity)."""
    import logging

    logger = logging.getLogger("myraytracer_tpu")
    old = logger.level
    viewer = LiveViewer(0)
    try:
        _get(viewer.port, "/?log_level=debug")
        assert logger.level == logging.DEBUG
        _get(viewer.port, "/?log_level=warning")
        assert logger.level == logging.WARNING
    finally:
        logger.setLevel(old)
        viewer.close()


def test_viewer_aov_endpoints_and_string_gamma():
    """set_aovs publishes /aov/<name>.png (404 for unpublished names),
    and string transfers ('srgb'/'aces') construct without the old
    float() crash."""
    import urllib.error
    import urllib.request

    import numpy as np

    from myraytracer_tpu.output.image import read_png
    from myraytracer_tpu.viewer import LiveViewer

    v = LiveViewer(0, gamma="aces")
    try:
        img = np.zeros((8, 16, 3), np.float32)
        img[..., 0] = 0.5
        v.set_aovs({"albedo": img})
        with urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/aov/albedo.png"
        ) as r:
            body = r.read()
        import io
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            f.write(body)
            f.flush()
            decoded = read_png(f.name)
        assert decoded.shape == (8, 16, 3)
        # Linear (gamma-1.0) encode: 0.5 → 128, no transfer curve.
        assert abs(int(decoded[0, 0, 0]) - 128) <= 1
        assert decoded[0, 0, 1] == 0
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/aov/depth.png"
            )
            assert False, "unpublished AOV must 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        v._server.shutdown()


def test_cli_serve_publishes_aovs(tmp_path):
    """--serve + --aov: the render loop publishes the requested guide
    channels at startup; unrequested channels stay 404."""
    import urllib.error
    import urllib.request

    from myraytracer_tpu import cli
    from myraytracer_tpu import viewer as viewer_mod
    from myraytracer_tpu.render.session import RenderSession

    captured = {}
    real_init = viewer_mod.LiveViewer.__init__

    def vinit(self, port, *a, **kw):
        real_init(self, port, *a, **kw)
        captured["viewer"] = self

    real_step = RenderSession.step
    counts = {"steps": 0, "codes": {}}

    def step(self):
        counts["steps"] += 1
        if counts["steps"] == 2:
            for name in ("albedo", "normal", "depth"):
                try:
                    with urllib.request.urlopen(
                        "http://127.0.0.1:%d/aov/%s.png"
                        % (captured["viewer"].port, name)
                    ) as r:
                        counts["codes"][name] = r.status
                except urllib.error.HTTPError as e:
                    counts["codes"][name] = e.code
        return real_step(self)

    viewer_mod.LiveViewer.__init__ = vinit
    RenderSession.step = step
    try:
        rc = cli.main([
            "--width", "64", "--height", "32", "--samples-per-frame", "2",
            "--ray-depth", "4", "--frames", "4", "--scene", "three-sphere",
            "--backend", "jnp", "--serve", "0", "--aov", "albedo,normal",
            "--out", str(tmp_path / "s.png"),
        ])
    finally:
        RenderSession.step = real_step
        viewer_mod.LiveViewer.__init__ = real_init
    assert rc == 0
    assert counts["codes"] == {"albedo": 200, "normal": 200, "depth": 404}


def test_stats_reports_published_aovs():
    """/stats.json lists published AOV names (page renders them as
    links), surviving subsequent frame updates."""
    import json
    import urllib.request

    import numpy as np

    from myraytracer_tpu.viewer import LiveViewer

    v = LiveViewer(0)
    try:
        v.set_aovs({"albedo": np.zeros((4, 4, 3), np.float32),
                    "depth": np.zeros((4, 4, 3), np.float32)})
        v.update(np.zeros((4, 4, 3), np.float32), 1, 2)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/stats.json"
        ) as r:
            stats = json.loads(r.read())
        assert stats["aovs"] == ["albedo", "depth"]
        assert stats["frame"] == 1
    finally:
        v._server.shutdown()


def test_cli_adaptive_serve_publishes_aovs(tmp_path):
    """--adaptive --serve + --aov publishes the guide channels once
    (fixed camera) before the schedule starts."""
    import urllib.error
    import urllib.request

    from myraytracer_tpu import cli
    from myraytracer_tpu import viewer as viewer_mod
    from myraytracer_tpu.render.adaptive import AdaptiveSession

    captured = {}
    real_init = viewer_mod.LiveViewer.__init__

    def vinit(self, port, *a, **kw):
        real_init(self, port, *a, **kw)
        captured["viewer"] = self

    real_step = AdaptiveSession.step
    codes = {}

    def step(self):
        if not codes:
            for name in ("depth", "albedo"):
                try:
                    with urllib.request.urlopen(
                        "http://127.0.0.1:%d/aov/%s.png"
                        % (captured["viewer"].port, name)
                    ) as r:
                        codes[name] = r.status
                except urllib.error.HTTPError as e:
                    codes[name] = e.code
        return real_step(self)

    viewer_mod.LiveViewer.__init__ = vinit
    AdaptiveSession.step = step
    try:
        rc = cli.main([
            "--width", "64", "--height", "32", "--samples-per-frame", "2",
            "--ray-depth", "4", "--frames", "6", "--scene", "three-sphere",
            "--backend", "jnp", "--adaptive", "--serve", "0",
            "--aov", "depth", "--out", str(tmp_path / "a.png"),
        ])
    finally:
        AdaptiveSession.step = real_step
        viewer_mod.LiveViewer.__init__ = real_init
    assert rc == 0
    assert codes == {"depth": 200, "albedo": 404}


def test_viewer_stats_report_auto_noise():
    """The auto-denoise path's measured noise level rides stats.json
    (denoise_noise) when supplied, and is absent otherwise — the page
    renders 'auto (k iters, noise s)' from it."""
    import json

    viewer = LiveViewer(0)
    try:
        fb = np.zeros((4, 6, 3), np.float32)
        viewer.update(fb, frame=1, spp=2, denoise=3, denoise_auto=True,
                      denoise_noise=0.012345)
        s = json.loads(_get(viewer.port, "/stats.json")[0])
        assert s["denoise_auto"] is True and s["denoise"] == 3
        assert abs(s["denoise_noise"] - 0.012345) < 1e-5  # ~5 places
        viewer.update(fb, frame=2, spp=4)
        s = json.loads(_get(viewer.port, "/stats.json")[0])
        assert "denoise_noise" not in s
    finally:
        viewer.close()
