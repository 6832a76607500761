"""Progressive accumulation + checkpoint/resume (lib.rs:299-306 semantics)."""

import numpy as np
import pytest

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.render.session import RenderSession
from myraytracer_tpu.scene import presets

CFG = RenderConfig(width=16, height=8, samples_per_frame=2, ray_depth=4)


def mk_session(**kw):
    cfg = CFG.replace(**kw) if kw else CFG
    return RenderSession(presets.reference_scene(), cfg)


def test_running_mean_with_cap_1():
    """max_weight=1 ⇒ the framebuffer is the exact running mean of frames."""
    s = mk_session()
    frames = []
    for i in range(3):
        img, _ = s._render(s.scene, s.key, np.uint32(i * CFG.samples_per_frame))
        frames.append(np.asarray(img))
    fb = None
    for k in range(3):
        fb = s.step()
    want = np.mean(frames, axis=0)
    np.testing.assert_allclose(np.asarray(fb), want, rtol=2e-6, atol=2e-7)


def test_ema_cap_semantics():
    """weight = min(cap, n/(n+1)) (lib.rs:301-304): cap 0.5 after frame 1."""
    s = mk_session(max_framebuffer_weight=0.5)
    f0 = np.asarray(s.step())
    img1, _ = s._render(s.scene, s.key, np.uint32(CFG.samples_per_frame))
    f1 = np.asarray(s.step())
    want = np.asarray(img1) * 0.5 + f0 * 0.5
    np.testing.assert_allclose(f1, want, rtol=2e-6, atol=2e-7)
    # Third frame: weight stays capped at 0.5.
    img2, _ = s._render(s.scene, s.key, np.uint32(2 * CFG.samples_per_frame))
    f2 = np.asarray(s.step())
    want2 = np.asarray(img2) * 0.5 + f1 * 0.5
    np.testing.assert_allclose(f2, want2, rtol=2e-6, atol=2e-7)


def test_first_frame_weight_zero():
    """Initial framebuffer weight is 0 (lib.rs:424): frame 1 replaces."""
    s = mk_session()
    img0, _ = s._render(s.scene, s.key, np.uint32(0))
    fb = s.step()
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(img0))


def test_checkpoint_resume_continues_stream(tmp_path):
    path = tmp_path / "ckpt.npz"
    a = mk_session()
    for _ in range(2):
        a.step()
    a.save_checkpoint(path)
    for _ in range(2):
        a.step()

    b = mk_session()
    b.load_checkpoint(path)
    assert b.frame_count == 2 and b.sample_cursor == 4
    for _ in range(2):
        b.step()
    np.testing.assert_array_equal(np.asarray(a.framebuffer), np.asarray(b.framebuffer))


def test_checkpoint_rejects_mismatched_config(tmp_path):
    path = tmp_path / "ckpt.npz"
    a = mk_session()
    a.step()
    a.save_checkpoint(path)
    b = RenderSession(
        presets.reference_scene(),
        CFG.replace(samples_per_frame=3),
    )
    import pytest

    with pytest.raises(ValueError):
        b.load_checkpoint(path)


def test_set_camera_moves_without_rebuild():
    """set_camera repacks scene.cam, resets accumulation, and produces the
    image a fresh session at that camera/cursor would."""
    import pytest

    from myraytracer_tpu.scene.api import Camera

    s = RenderSession(presets.defocus_scene(), CFG)
    s.step()
    cam_b = Camera(
        lookfrom=(4.0, 1.5, 2.0), lookat=(0.0, 0.0, -1.0),
        vup=(0.0, 1.0, 0.0), vfov_degrees=30.0, aperture=0.4,
        focus_dist=4.5,
    )
    render = s._render  # same compiled renderer object
    s.set_camera(cam_b)
    assert s.frame_count == 0
    assert float(np.abs(np.asarray(s.framebuffer)).max()) == 0.0
    assert s._render is render  # no rebuild
    fb = s.step()
    want, _ = render(s.scene, s.key, np.uint32(CFG.samples_per_frame))
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(want))

    # the reference camera is fixed by contract
    ref = mk_session()
    with pytest.raises(ValueError):
        ref.set_camera(presets.reference_scene().camera)


def test_checkpoint_rejects_different_scene(tmp_path):
    """The scene fingerprint refuses a resume against a different world."""
    import pytest

    path = tmp_path / "ckpt.npz"
    a = mk_session()
    a.step()
    a.save_checkpoint(path)
    b = RenderSession(presets.three_sphere_scene(), CFG)
    with pytest.raises(ValueError, match="fingerprint"):
        b.load_checkpoint(path)


def test_checkpoint_rejects_backend_mismatch(tmp_path):
    import functools

    from myraytracer_tpu.kernels.trace import make_renderer as make_pallas

    path = tmp_path / "ckpt.npz"
    a = mk_session()
    a.step()
    a.save_checkpoint(path)
    # An ACTUAL pallas renderer (interpret mode off-TPU): provenance now
    # records the renderer in use, not the config's wish — a default
    # (jnp) factory under backend="pallas" records "jnp".
    b = RenderSession(
        presets.reference_scene(), CFG.replace(backend="pallas"),
        renderer_factory=functools.partial(make_pallas, interpret=True),
    )
    with pytest.raises(ValueError, match="backend"):
        b.load_checkpoint(path)


def test_checkpoint_restores_runtime_camera(tmp_path):
    """A checkpoint taken after set_camera resumes under the moved camera,
    not the construction camera (the blend would otherwise silently mix
    two views)."""
    from myraytracer_tpu.scene.api import Camera

    path = tmp_path / "ckpt.npz"
    world = presets.defocus_scene()
    a = RenderSession(world, CFG)
    cam_b = Camera(
        lookfrom=(4.0, 1.5, 2.0), lookat=(0.0, 0.0, -1.0),
        vup=(0.0, 1.0, 0.0), vfov_degrees=30.0, aperture=0.4,
        focus_dist=4.5,
    )
    a.set_camera(cam_b)
    a.step()
    a.save_checkpoint(path)
    a.step()

    b = RenderSession(world, CFG)  # construction camera ≠ cam_b
    b.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(b.scene.cam), np.asarray(a.scene.cam))
    b.step()
    np.testing.assert_array_equal(
        np.asarray(a.framebuffer), np.asarray(b.framebuffer)
    )


def test_segments_accumulate_float64():
    """Totals fold into a host float64 (no f32 running-sum degradation)."""
    s = mk_session()
    s._segs_total = 1e9  # large prior total: f32 would round each add away
    s.step()
    s.step()
    total = s.segments_traced
    assert total > 1e9  # per-step counts (~hundreds) survived the fold
    assert s.segments_traced == total  # folding is idempotent
    assert not s._segs_pending


def test_ambient_is_part_of_scene_fingerprint():
    """A different background must invalidate checkpoint resume (the
    ambient is a static kernel constant, not a compiled-array leaf)."""
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.session import RenderSession
    from myraytracer_tpu.scene.api import World
    from myraytracer_tpu.scene.presets import reference_scene

    base = reference_scene()
    dark = World(base.spheres, camera=base.camera, ambient=(0.0, 0.0, 0.0))
    cfg = RenderConfig(width=16, height=8, samples_per_frame=1,
                       ray_depth=2, backend="jnp")
    fp_a = RenderSession(base, cfg).scene_fingerprint
    fp_b = RenderSession(dark, cfg).scene_fingerprint
    assert fp_a != fp_b


def test_checkpoint_rejects_t_window_mismatch(tmp_path):
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.session import RenderSession
    from myraytracer_tpu.scene.presets import reference_scene

    cfg = RenderConfig(width=16, height=8, samples_per_frame=1,
                       ray_depth=2, backend="jnp")
    a = RenderSession(reference_scene(), cfg)
    a.step()
    path = tmp_path / "t.npz"
    a.save_checkpoint(path)
    b = RenderSession(reference_scene(), cfg.replace(t_min=1e-1))
    with pytest.raises(ValueError, match="t_min"):
        b.load_checkpoint(path)


def test_checkpoint_rejects_reference_to_general_camera(tmp_path):
    """Symmetric camera provenance: a fixed-reference-view checkpoint must
    not resume into a positionable-camera session (two different views)."""
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.session import RenderSession
    from myraytracer_tpu.scene.api import Camera, World
    from myraytracer_tpu.scene.presets import reference_scene

    cfg = RenderConfig(width=16, height=8, samples_per_frame=1,
                       ray_depth=2, backend="jnp")
    ref = reference_scene()
    a = RenderSession(ref, cfg)
    a.step()
    path = tmp_path / "c.npz"
    a.save_checkpoint(path)
    general = World(ref.spheres, camera=Camera(lookfrom=(0, 0, 1)))
    b = RenderSession(general, cfg)
    with pytest.raises(ValueError, match="no runtime camera"):
        b.load_checkpoint(path)


def test_step_refuses_draw_index_overflow():
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.render.session import RenderSession
    from myraytracer_tpu.scene.presets import reference_scene

    cfg = RenderConfig(width=16, height=8, samples_per_frame=1,
                       ray_depth=2, backend="jnp")
    s = RenderSession(reference_scene(), cfg)
    s.sample_cursor = 0xFFFFFFFF // crng.DRAWS_PER_SAMPLE
    with pytest.raises(RuntimeError, match="alias"):
        s.step()


def test_default_factory_records_jnp_backend():
    """RenderSession's default renderer IS the jnp integrator; the
    checkpoint provenance must say so regardless of platform."""
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.session import RenderSession
    from myraytracer_tpu.scene.presets import reference_scene

    s = RenderSession(
        reference_scene(),
        RenderConfig(width=16, height=8, samples_per_frame=1,
                     ray_depth=2, backend="auto"),
    )
    assert s.backend_resolved == "jnp"
