"""Cold-start mitigation (utils/cache.py): persistent XLA cache wiring,
the exported-renderer cache, and execution-path checkpoint provenance.

The reference pays no compile cost (wgpu pipelines build instantly,
raytracer/src/lib.rs:986-1068); on TPU the megakernel compile is minutes
cold, so warm starts are a product feature with its own tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.render.session import RenderSession
from myraytracer_tpu.scene import presets
from myraytracer_tpu.utils import cache as ucache


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    """Point the package cache at a fresh tmp dir (and reset memoization)."""
    monkeypatch.delenv("MYRT_CACHE", raising=False)
    monkeypatch.setenv("MYRT_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(ucache, "_ENABLED_DIR", None)
    return tmp_path


def test_cache_root_disabled(monkeypatch):
    monkeypatch.setenv("MYRT_CACHE", "0")
    assert ucache.cache_root() is None
    fn, used = ucache.export_cached_renderer(
        lambda x: x * 2.0, (jnp.float32(1.0),), key_parts=("t",)
    )
    assert not used  # plain jit fallback
    assert float(fn(jnp.float32(2.0))) == 4.0


def test_enable_persistent_cache(cache_dir):
    root = ucache.enable_persistent_cache()
    assert root == cache_dir
    assert (cache_dir / "xla").is_dir()
    assert jax.config.jax_compilation_cache_dir == str(cache_dir / "xla")
    # idempotent
    assert ucache.enable_persistent_cache() == root


def test_code_fingerprint_stable():
    assert ucache.code_fingerprint() == ucache.code_fingerprint()
    assert len(ucache.code_fingerprint()) == 16


def test_export_cached_renderer_roundtrip(cache_dir):
    """Cold call exports + persists; warm call deserializes (no retrace);
    both produce identical results. V3 in the signature exercises the
    NamedTuple serialization registration."""
    calls = []

    def fn(v, s):
        calls.append(1)  # traced on export only
        return (v.x + v.y * s, v.z - s)

    v = V3(jnp.float32(1.0), jnp.float32(2.0), jnp.float32(3.0))
    args = (v, jnp.float32(0.5))

    r1, used1 = ucache.export_cached_renderer(fn, args, key_parts=("toy",))
    assert used1
    blobs = list((cache_dir / "export").glob("*.jaxexport"))
    assert len(blobs) == 1
    a1 = r1(*args)

    n_traces = len(calls)
    r2, used2 = ucache.export_cached_renderer(fn, args, key_parts=("toy",))
    assert used2
    assert len(calls) == n_traces  # warm path never re-traced fn
    a2 = r2(*args)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    np.testing.assert_array_equal(np.asarray(a1[1]), np.asarray(a2[1]))

    # A different static key (e.g. changed render config) is a new entry.
    _, used3 = ucache.export_cached_renderer(fn, args, key_parts=("toy2",))
    assert used3
    assert len(list((cache_dir / "export").glob("*.jaxexport"))) == 2


def test_export_cache_corrupt_blob_reexports(cache_dir):
    def fn(x):
        return x + 1.0

    args = (jnp.float32(1.0),)
    ucache.export_cached_renderer(fn, args, key_parts=("c",))
    blob = next((cache_dir / "export").glob("*.jaxexport"))
    blob.write_bytes(b"not a serialized export")
    r, used = ucache.export_cached_renderer(fn, args, key_parts=("c",))
    assert used  # re-exported after the loud-logged read failure
    assert float(r(jnp.float32(4.0))) == 5.0


@pytest.mark.slow
def test_checkpoint_exec_provenance(tmp_path):
    """A checkpoint produced through the export path must refuse to resume
    on plain jit (and vice versa): the compiled modules agree only
    statistically (utils/cache.py docstring)."""
    cfg = RenderConfig(width=16, height=8, samples_per_frame=1, ray_depth=2)
    world = presets.reference_scene()
    s = RenderSession(world, cfg)
    assert s.exec_path == "jit"  # CPU sessions never take the export path
    s.step()
    s.exec_path = "export"  # simulate a TPU export-path session
    path = tmp_path / "e.npz"
    s.save_checkpoint(path)

    s2 = RenderSession(world, cfg)
    with pytest.raises(ValueError, match="exec"):
        s2.load_checkpoint(path)

    # Same path resumes fine.
    s3 = RenderSession(world, cfg)
    s3.exec_path = "export"
    s3.load_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(s.framebuffer), np.asarray(s3.framebuffer)
    )


def test_denoiser_feature_pass_export_cached(cache_dir):
    """The Denoiser's feature pass and filter route through the export
    cache (VERDICT r04 item 3): a warm construction + call deserializes
    blobs instead of re-tracing, and produces identical buffers."""
    from myraytracer_tpu.render.denoise import Denoiser

    world = presets.reference_scene()
    w, h = 16, 8
    fb = jnp.ones((h, w, 3), jnp.float32) * 0.5

    d1 = Denoiser(world, w, h, iterations=2)
    out1 = np.asarray(d1(fb))
    f1 = [np.asarray(a) for a in d1.features()]
    blobs = list((cache_dir / "export").glob("*.jaxexport"))
    assert len(blobs) == 2  # aux pass + 2-iteration filter

    d2 = Denoiser(world, w, h, iterations=2)
    out2 = np.asarray(d2(fb))
    f2 = [np.asarray(a) for a in d2.features()]
    assert len(list((cache_dir / "export").glob("*.jaxexport"))) == 2
    np.testing.assert_array_equal(out1, out2)
    for a, b in zip(f1, f2):
        np.testing.assert_array_equal(a, b)

    # A different iteration count is a new filter entry, same aux blob.
    d3 = Denoiser(world, w, h, iterations=1)
    d3(fb)
    assert len(list((cache_dir / "export").glob("*.jaxexport"))) == 3
