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
