"""Multi-device sharding on a virtual 8-device CPU mesh.

The conftest forces ``--xla_force_host_platform_device_count=8`` so these
run anywhere (SURVEY.md §4: "multi-node without a cluster").
"""

import jax
import numpy as np
import pytest

from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.parallel.sharding import (
    default_mesh,
    make_sample_sharded_renderer,
    make_tile_sharded_renderer,
)
from myraytracer_tpu.render.integrator import make_renderer
from myraytracer_tpu.scene import presets
from myraytracer_tpu.scene.compile import compile_scene

W, H, SPP, DEPTH = 16, 12, 4, 4
KEY = crng.key_from_seed(0)


@pytest.fixture(scope="module")
def scene():
    return compile_scene(presets.reference_scene())


@pytest.fixture(scope="module")
def single(scene):
    cam = presets.reference_scene().camera
    render = make_renderer(cam, W, H, SPP, DEPTH, sample_batch=2)
    img, segs = render(scene, KEY, 0)
    return np.asarray(img), float(segs)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_tile_sharded_matches_single(scene, single):
    cam = presets.reference_scene().camera
    render = make_tile_sharded_renderer(cam, W, H, SPP, DEPTH, sample_batch=2)
    img, segs = render(scene, KEY, 0)
    img = np.asarray(img)
    assert img.shape == (H, W, 3)
    # Identical lanes, identical counter-based RNG, identical reduction
    # order per lane → bitwise equal.
    np.testing.assert_array_equal(img, single[0])


def test_tile_sharded_segments_cover_extra_rows(scene, single):
    # Padded rows (ceil(12/8)*8 = 16) are traced then cropped; segment
    # accounting includes them, so it is >= the single-device count.
    cam = presets.reference_scene().camera
    render = make_tile_sharded_renderer(cam, W, H, SPP, DEPTH, sample_batch=2)
    _, segs = render(scene, KEY, 0)
    assert float(segs) >= single[1]


def test_sample_sharded_matches_single(scene, single):
    cam = presets.reference_scene().camera
    render = make_sample_sharded_renderer(cam, W, H, SPP, DEPTH, sample_batch=1)
    img, segs = render(scene, KEY, 0)
    img = np.asarray(img)
    # psum reduction order differs from the sequential scan → fp-tolerance.
    np.testing.assert_allclose(img, single[0], rtol=1e-5, atol=1e-6)
    assert abs(float(segs) - single[1]) < 1.0


def test_sample_sharded_uneven_spp(scene):
    """spp=5 over 8 devices: masking must keep exactly 5 samples."""
    cam = presets.reference_scene().camera
    render5 = make_sample_sharded_renderer(cam, W, H, 5, DEPTH, sample_batch=1)
    img5, _ = render5(scene, KEY, 0)
    single5 = make_renderer(cam, W, H, 5, DEPTH, sample_batch=1)
    want, _ = single5(scene, KEY, 0)
    np.testing.assert_allclose(np.asarray(img5), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_default_mesh_shape():
    mesh = default_mesh()
    assert mesh.devices.size == 8


# ---------------------------------------------------------------------------
# Pallas megakernel under shard_map (interpret mode): the sharded paths
# must be exercised with the production block too, not just the jnp
# oracle — prefetch operands and the static output layout must partition
# cleanly. Contract: tile sharding is bitwise vs single-device pallas;
# psum modes are fp-tolerant (reduction order).
# ---------------------------------------------------------------------------

import functools

from myraytracer_tpu.kernels import trace as ktrace
from myraytracer_tpu.parallel.sharding import make_hybrid_sharded_renderer

PALLAS_BLOCK = functools.partial(
    ktrace.make_block_renderer, tile_rows=8, interpret=True
)


@pytest.fixture(scope="module")
def single_pallas(scene):
    cam = presets.reference_scene().camera
    render = ktrace.make_renderer(
        cam, W, H, SPP, DEPTH, tile_rows=8, interpret=True
    )
    img, segs = render(scene, KEY, 0)
    return np.asarray(img), float(segs)


def test_pallas_tile_sharded_bitwise(scene, single_pallas):
    cam = presets.reference_scene().camera
    render = make_tile_sharded_renderer(
        cam, W, H, SPP, DEPTH, block_factory=PALLAS_BLOCK
    )
    img, segs = render(scene, KEY, 0)
    np.testing.assert_array_equal(np.asarray(img), single_pallas[0])
    assert float(segs) >= single_pallas[1]  # padded rows traced, cropped


def test_pallas_sample_sharded(scene, single_pallas):
    cam = presets.reference_scene().camera
    render = make_sample_sharded_renderer(
        cam, W, H, SPP, DEPTH, block_factory=PALLAS_BLOCK
    )
    img, segs = render(scene, KEY, 0)
    np.testing.assert_allclose(
        np.asarray(img), single_pallas[0], rtol=1e-5, atol=1e-6
    )
    assert abs(float(segs) - single_pallas[1]) < 1.0


def test_pallas_hybrid_sharded(scene, single_pallas):
    cam = presets.reference_scene().camera
    render = make_hybrid_sharded_renderer(
        cam, W, H, SPP, DEPTH, block_factory=PALLAS_BLOCK
    )
    img, segs = render(scene, KEY, 0)
    np.testing.assert_allclose(
        np.asarray(img), single_pallas[0], rtol=1e-5, atol=1e-6
    )


def test_hybrid_jnp_matches_single(scene, single):
    cam = presets.reference_scene().camera
    render = make_hybrid_sharded_renderer(
        cam, W, H, SPP, DEPTH, sample_batch=1
    )
    img, _ = render(scene, KEY, 0)
    np.testing.assert_allclose(
        np.asarray(img), single[0], rtol=1e-5, atol=1e-6
    )


# ---------------------------------------------------------------------------
# Frame batching under tile sharding (the small-spp streaming mode):
# frames=K returns [K, 3, H, W] per-frame means, each frame bitwise the
# single-frame tile-sharded call at its sample offset. Sample/hybrid
# modes reject frames (non-contiguous per-device windows).
# ---------------------------------------------------------------------------


def test_tile_sharded_frames_jnp_bitwise(scene):
    cam = presets.reference_scene().camera
    multi = make_tile_sharded_renderer(cam, W, H, SPP, DEPTH, frames=2)
    imgs, segs = multi(scene, KEY, 0)
    imgs = np.asarray(imgs)
    assert imgs.shape == (2, 3, H, W)
    one = make_tile_sharded_renderer(cam, W, H, SPP, DEPTH)
    for f in range(2):
        want, _ = one(scene, KEY, f * SPP)
        np.testing.assert_array_equal(
            imgs[f], np.transpose(np.asarray(want), (2, 0, 1))
        )


@pytest.mark.slow
def test_tile_sharded_frames_pallas_bitwise(scene):
    cam = presets.reference_scene().camera
    multi = make_tile_sharded_renderer(
        cam, W, H, SPP, DEPTH, block_factory=PALLAS_BLOCK, frames=2
    )
    imgs, _ = multi(scene, KEY, 0)
    imgs = np.asarray(imgs)
    assert imgs.shape == (2, 3, H, W)
    one = make_tile_sharded_renderer(
        cam, W, H, SPP, DEPTH, block_factory=PALLAS_BLOCK
    )
    for f in range(2):
        want, _ = one(scene, KEY, f * SPP)
        np.testing.assert_array_equal(
            imgs[f], np.transpose(np.asarray(want), (2, 0, 1))
        )


def test_sample_and_hybrid_reject_frames():
    cam = presets.reference_scene().camera
    with pytest.raises(ValueError, match="tiles"):
        make_sample_sharded_renderer(cam, W, H, SPP, DEPTH, frames=2)
    with pytest.raises(ValueError, match="tiles"):
        make_hybrid_sharded_renderer(cam, W, H, SPP, DEPTH, frames=2)


def test_session_tile_sharded_frame_batch_bitwise():
    """Session-level: shard='tiles' + frame_batch=2 blends bitwise like
    single-frame stepping (the invariant frame batching guarantees)."""
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.dispatch import make_session

    world = presets.reference_scene()
    cfg = RenderConfig(
        width=W, height=H, samples_per_frame=SPP, ray_depth=DEPTH,
        shard="tiles",
    )
    a = make_session(world, cfg.replace(frame_batch=2))
    assert a.frame_batch == 2
    a.step()
    b = make_session(world, cfg)
    b.step()
    b.step()
    np.testing.assert_array_equal(
        np.asarray(a.framebuffer), np.asarray(b.framebuffer)
    )


# ---------------------------------------------------------------------------
# Multi-host wiring (pod-scale). Only one process exists in CI, so these
# exercise the mesh-construction / spec-parsing / gather logic — the parts
# that differ under multi-process semantics.
# ---------------------------------------------------------------------------

from myraytracer_tpu.parallel.sharding import (
    fetch_array,
    hybrid_mesh,
    parse_multihost_spec,
)


def test_hybrid_mesh_shapes():
    mesh = hybrid_mesh()
    assert mesh.shape == {"tiles": 4, "samples": 2}
    mesh4 = hybrid_mesh(samples=4)
    assert mesh4.shape == {"tiles": 2, "samples": 4}
    mesh1 = hybrid_mesh(jax.devices()[:3])
    assert mesh1.shape == {"tiles": 3, "samples": 1}
    with pytest.raises(ValueError):
        hybrid_mesh(samples=3)  # 3 does not divide 8


def test_parse_multihost_spec():
    assert parse_multihost_spec("") == {}
    assert parse_multihost_spec("10.0.0.1:8476") == {
        "coordinator_address": "10.0.0.1:8476"
    }
    assert parse_multihost_spec("10.0.0.1:8476,16,3") == {
        "coordinator_address": "10.0.0.1:8476",
        "num_processes": 16,
        "process_id": 3,
    }
    with pytest.raises(ValueError):
        parse_multihost_spec("a,b")


def test_fetch_array_assembles_sharded_output(scene, single):
    """fetch_array materializes a mesh-sharded jit output (the multihost
    gather path degenerates to device_get when all shards are local)."""
    cam = presets.reference_scene().camera
    render = make_tile_sharded_renderer(cam, W, H, SPP, DEPTH, sample_batch=2)
    img, _ = render(scene, KEY, 0)
    got = fetch_array(img)
    assert isinstance(got, np.ndarray)
    np.testing.assert_array_equal(got, single[0])
    # plain numpy passes through
    np.testing.assert_array_equal(fetch_array(single[0]), single[0])


def test_tile_sharded_light_scene_matches_single():
    """Emissive scene + constant background through the sharded path:
    the sky/material_set kwargs must reach the per-device blocks."""
    world = presets.light_scene()
    lscene = compile_scene(world)
    kw = dict(material_set=(1, 2, 4), sky=world.ambient)
    single_r = make_renderer(world.camera, W, H, SPP, DEPTH,
                             sample_batch=2, **kw)
    want, _ = single_r(lscene, KEY, 0)
    sharded = make_tile_sharded_renderer(world.camera, W, H, SPP, DEPTH,
                                         sample_batch=2, **kw)
    got, _ = sharded(lscene, KEY, 0)
    arr = np.asarray(got)
    assert arr.max() > 0.5  # the lights illuminate through the shard path
    np.testing.assert_array_equal(arr, np.asarray(want))


def test_block_factory_string_pallas_interprets_off_tpu(scene):
    """block_factory=\"pallas\" off-TPU must fall back to interpret mode
    (the same fallback dispatch applies unsharded) instead of crashing
    at Mosaic compile."""
    cam = presets.reference_scene().camera
    render = make_tile_sharded_renderer(
        cam, W, H, SPP, DEPTH, block_factory="pallas"
    )
    img, segs = render(scene, KEY, 0)
    img = np.asarray(img)
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all() and img.max() > 0
