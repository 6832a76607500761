"""Backend/sharding dispatch and auxiliary utilities."""

import numpy as np
import pytest

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.render.dispatch import make_session, resolve_backend
from myraytracer_tpu.scene import presets


def test_resolve_backend_explicit():
    assert resolve_backend(RenderConfig(backend="jnp")) == "jnp"
    assert resolve_backend(RenderConfig(backend="pallas")) == "pallas"
    # auto on CPU → jnp (tests force the CPU platform).
    assert resolve_backend(RenderConfig(backend="auto")) == "jnp"


def test_make_session_renders():
    cfg = RenderConfig(width=16, height=8, samples_per_frame=2, ray_depth=4)
    s = make_session(presets.reference_scene(), cfg)
    fb = np.asarray(s.step())
    assert fb.shape == (8, 16, 3)
    assert np.isfinite(fb).all()


def test_sharded_session_matches_unsharded():
    cfg = RenderConfig(width=16, height=8, samples_per_frame=2, ray_depth=4)
    a = make_session(presets.reference_scene(), cfg)
    b = make_session(presets.reference_scene(), cfg.replace(shard="tiles"))
    fa = np.asarray(a.step())
    fb = np.asarray(b.step())
    np.testing.assert_array_equal(fa, fb)


def test_hybrid_shard_session():
    cfg = RenderConfig(
        width=16, height=8, samples_per_frame=4, ray_depth=4, shard="hybrid"
    )
    s = make_session(presets.reference_scene(), cfg)
    fb = np.asarray(s.step())
    assert np.isfinite(fb).all()


def test_sample_batch_resolution():
    assert RenderConfig(width=16, height=8, samples_per_frame=4).resolve_sample_batch() == 4
    big = RenderConfig(width=4096, height=4096, samples_per_frame=64)
    assert big.resolve_sample_batch() == 1  # lane budget caps the batch
    forced = RenderConfig(samples_per_frame=8, sample_batch=2)
    assert forced.resolve_sample_batch() == 2


def test_profiling_utils(tmp_path):
    from myraytracer_tpu.utils.profiling import enable_debug_nans, profile_trace

    import jax
    import jax.numpy as jnp

    with profile_trace(str(tmp_path / "trace")):
        jnp.ones(8).sum().block_until_ready()

    enable_debug_nans(True)
    try:
        with pytest.raises(Exception):
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0)).block_until_ready()
    finally:
        enable_debug_nans(False)


@pytest.mark.slow
def test_explicit_pallas_off_tpu_uses_interpret():
    """--backend pallas on a non-TPU platform runs the kernel in
    interpret mode instead of failing at Mosaic compile."""
    import numpy as np

    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.dispatch import make_session
    from myraytracer_tpu.scene import presets

    s = make_session(
        presets.reference_scene(),
        RenderConfig(width=16, height=8, samples_per_frame=1, ray_depth=2,
                     backend="pallas"),
    )
    fb = np.asarray(s.step())
    assert np.isfinite(fb).all() and fb.mean() > 0.0


def test_smem_fallback_session_builds_bvh(monkeypatch):
    """A scene past even the VMEM-table capacity falls back to jnp and
    really has the flat BVH (the fast path the warning promises).

    Since round 2, big triangle tables ride VMEM (a 25.6k-tri scene
    stays on the kernel — tests/test_pallas.py::test_smem_budget_cap),
    so the overflow is forced here to exercise the fallback wiring."""
    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.kernels import trace
    from myraytracer_tpu.render import dispatch
    from myraytracer_tpu.scene import presets

    world = presets.mesh_scene(subdivisions=3)  # >512 tris → BVH-eligible
    monkeypatch.setattr(dispatch, "resolve_backend", lambda config: "pallas")
    monkeypatch.setattr(trace, "fits_in_smem", lambda *a, **kw: False)
    session = dispatch.make_session(world, RenderConfig(
        width=16, height=8, samples_per_frame=1, ray_depth=2,
        backend="auto",
    ))
    assert session.config.backend == "jnp"
    assert session.scene.tris is not None
    assert session.scene.tris.bvh is not None
