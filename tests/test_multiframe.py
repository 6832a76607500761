"""Frame batching: K progressive frames per device call, bitwise equal to
K separate frames (kernels/trace.py multi-frame buckets; the small-spp
throughput fix — lanes regenerate across frame boundaries so the whole
K*spp window shares one regeneration tail)."""

import pytest

import numpy as np

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.kernels.trace import make_renderer as make_pallas_renderer
from myraytracer_tpu.render.integrator import make_renderer as make_jnp_renderer
from myraytracer_tpu.render.session import RenderSession
from myraytracer_tpu.scene import presets
from myraytracer_tpu.scene.compile import compile_scene

W, H, SPP, DEPTH, K = 16, 8, 2, 4, 3
KEY = crng.key_from_seed(0)


@pytest.mark.slow
def test_pallas_multiframe_bitwise_vs_single_calls():
    world = presets.three_sphere_scene()
    scene = compile_scene(world)
    single = make_pallas_renderer(
        world.camera, W, H, SPP, DEPTH, tile_rows=8, interpret=True
    )
    multi = make_pallas_renderer(
        world.camera, W, H, SPP, DEPTH, tile_rows=8, interpret=True, frames=K
    )
    imgs, segs_m = multi(scene, KEY, 0)
    assert imgs.shape == (K, 3, H, W)  # channels-first (TPU tiling)
    segs_total = 0.0
    for f in range(K):
        want, segs = single(scene, KEY, f * SPP)
        np.testing.assert_array_equal(
            np.asarray(imgs[f]).transpose(1, 2, 0), np.asarray(want)
        )
        segs_total += float(segs)
    assert float(segs_m) == segs_total


def test_jnp_multiframe_bitwise_vs_single_calls():
    world = presets.reference_scene()
    scene = compile_scene(world)
    single = make_jnp_renderer(world.camera, W, H, SPP, DEPTH, sample_batch=SPP)
    multi = make_jnp_renderer(
        world.camera, W, H, SPP, DEPTH, sample_batch=SPP, frames=K
    )
    imgs, _ = multi(scene, KEY, 0)
    for f in range(K):
        want, _ = single(scene, KEY, f * SPP)
        np.testing.assert_array_equal(
            np.asarray(imgs[f]).transpose(1, 2, 0), np.asarray(want)
        )


def test_session_frame_batch_bitwise():
    """A frame-batched session produces bitwise the framebuffer, counters
    and sample stream of the classic one-step-per-frame session."""
    for cap in (1.0, 0.5):
        cfg1 = RenderConfig(
            width=W, height=H, samples_per_frame=SPP, ray_depth=DEPTH,
            max_framebuffer_weight=cap,
        )
        a = RenderSession(presets.reference_scene(), cfg1)
        for _ in range(2 * K):
            a.step()
        b = RenderSession(
            presets.reference_scene(), cfg1.replace(frame_batch=K)
        )
        for _ in range(2):
            b.step()
        assert b.frame_count == a.frame_count
        assert b.sample_cursor == a.sample_cursor
        np.testing.assert_array_equal(
            np.asarray(a.framebuffer), np.asarray(b.framebuffer)
        )
        assert a.segments_traced == b.segments_traced


@pytest.mark.slow
def test_session_frame_batch_pallas_interpret():
    """The batched Pallas kernel drives a session identically too."""
    import functools

    from myraytracer_tpu.kernels.trace import make_renderer

    factory = functools.partial(make_renderer, tile_rows=8, interpret=True)
    cfg = RenderConfig(
        width=W, height=H, samples_per_frame=1, ray_depth=DEPTH,
    )
    a = RenderSession(
        presets.three_sphere_scene(), cfg, renderer_factory=factory
    )
    for _ in range(K):
        a.step()
    b = RenderSession(
        presets.three_sphere_scene(), cfg.replace(frame_batch=K),
        renderer_factory=factory,
    )
    b.step()
    np.testing.assert_array_equal(
        np.asarray(a.framebuffer), np.asarray(b.framebuffer)
    )


def test_auto_frame_batch_capped_by_max_frames():
    # `--frames 2` must render 2 frames, not a full auto window (cli.py
    # passes the requested count through config.max_frames).
    cfg = RenderConfig(samples_per_frame=1)
    assert cfg.resolve_frame_batch("pallas") == 64
    assert cfg.replace(max_frames=2).resolve_frame_batch("pallas") == 2
    # Explicit frame_batch wins over the hint; jnp auto stays classic.
    assert cfg.replace(
        max_frames=2, frame_batch=8
    ).resolve_frame_batch("pallas") == 8
    assert cfg.replace(max_frames=2).resolve_frame_batch("jnp") == 1


def test_frame_batch_rejects_sample_sharding():
    # Tile sharding composes with frame batching (contiguous per-chip
    # sample windows); sample/hybrid sharding does not.
    import pytest

    cfg = RenderConfig(
        width=W, height=H, samples_per_frame=1, ray_depth=2,
        frame_batch=2, shard="samples",
    )
    with pytest.raises(ValueError, match="frame_batch"):
        RenderSession(presets.reference_scene(), cfg)


@pytest.mark.slow
def test_pallas_multiframe_emissive_bitwise():
    """Frame batching over an emissive scene (per-frame radiance buckets
    must include the emission adds)."""
    world = presets.light_scene()
    scene = compile_scene(world)
    kw = dict(material_set=(1, 2, 4), sky=world.ambient, tile_rows=8,
              interpret=True)
    single = make_pallas_renderer(world.camera, W, H, SPP, DEPTH, **kw)
    multi = make_pallas_renderer(world.camera, W, H, SPP, DEPTH, frames=K, **kw)
    imgs, _ = multi(scene, KEY, 0)
    assert np.asarray(imgs).max() > 0.5
    for f in range(K):
        want, _ = single(scene, KEY, f * SPP)
        np.testing.assert_array_equal(
            np.asarray(imgs[f]).transpose(1, 2, 0), np.asarray(want)
        )
