"""Low-discrepancy camera sampling (the ``qmc`` knob).

Covers the scrambled Sobol (0,2) generator itself (net stratification,
van der Corput correctness), oracle/kernel stream parity, the convergence
win it exists for, and checkpoint provenance (a QMC stream must never be
blended into a default-stream accumulation).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.kernels.trace import make_renderer as make_pallas_renderer
from myraytracer_tpu.render.integrator import make_renderer as make_jnp_renderer
from myraytracer_tpu.render.session import RenderSession
from myraytracer_tpu.scene import presets
from myraytracer_tpu.scene.api import World
from myraytracer_tpu.scene.compile import compile_scene

KEY = crng.key_from_seed(0)


def test_van_der_corput_first_points():
    n = jnp.arange(8, dtype=jnp.uint32)
    x, _ = crng.sobol02(n, jnp.uint32(0), jnp.uint32(0))
    np.testing.assert_allclose(
        np.asarray(x), [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875]
    )


@pytest.mark.parametrize("scramble", [(0, 0), (0x9E3779B9, 0xDEADBEEF)])
def test_sobol02_net_stratification(scramble):
    """Any 16-point prefix covers every cell of the 4x4 (and 2x8, 8x2)
    grids exactly once — the (0,2)-net property, preserved under XOR
    scrambling (a digital shift permutes elementary intervals)."""
    n = jnp.arange(16, dtype=jnp.uint32)
    x, y = crng.sobol02(n, jnp.uint32(scramble[0]), jnp.uint32(scramble[1]))
    x, y = np.asarray(x), np.asarray(y)
    assert ((0.0 <= x) & (x < 1.0)).all() and ((0.0 <= y) & (y < 1.0)).all()
    for gx, gy in ((4, 4), (2, 8), (8, 2), (16, 1), (1, 16)):
        cells = set(zip((x * gx).astype(int), (y * gy).astype(int)))
        assert len(cells) == 16, f"{gx}x{gy} grid not stratified"


def test_qmc_camera_uniforms_deterministic_and_pairwise_independent():
    lane = jnp.arange(64, dtype=jnp.uint32)
    sample = jnp.zeros(64, jnp.uint32) + jnp.uint32(3)
    a1, a2 = crng.qmc_camera_uniforms(KEY, lane, sample, 0)
    b1, b2 = crng.qmc_camera_uniforms(KEY, lane, sample, 0)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))
    c1, _ = crng.qmc_camera_uniforms(KEY, lane, sample, 1)
    assert not np.array_equal(np.asarray(a1), np.asarray(c1))  # lens != jitter


def test_qmc_jitter_lens_planes_decorrelated():
    """The padded lens pair must not be a digital shift of the jitter pair.

    With a plain per-pair XOR scramble both pairs are the SAME Sobol point
    xor a constant (measured float correlation ~0.9), collapsing the 4-D
    camera sample set onto a 2-D manifold per pixel. The Owen index
    shuffle breaks that: per-pixel correlation between the planes must be
    near zero in every dimension combination."""
    n = 4096
    lane = jnp.zeros(n, jnp.uint32) + jnp.uint32(7)  # one pixel
    sample = jnp.arange(n, dtype=jnp.uint32)
    j1, j2 = crng.qmc_camera_uniforms(KEY, lane, sample, 0)
    l1, l2 = crng.qmc_camera_uniforms(KEY, lane, sample, 1)
    cols = np.stack([np.asarray(v) for v in (j1, j2, l1, l2)])
    corr = np.corrcoef(cols)
    # off-diagonal cross-plane entries: (j1,l1), (j1,l2), (j2,l1), (j2,l2)
    cross = np.abs(corr[:2, 2:])
    assert cross.max() < 0.1, corr


def test_owen_scramble_is_nested_uniform():
    """owen_scramble must preserve elementary intervals: points in the same
    half/quarter/… stay together (the property that keeps (0,2)-nets
    stratified), while the full map is a bijection on a sample of ids."""
    x = jnp.arange(1 << 12, dtype=jnp.uint32) << jnp.uint32(20)
    seed = jnp.uint32(0xC0FFEE01)
    y = np.asarray(crng.owen_scramble(x, seed))
    xs = np.asarray(x)
    for bits in (1, 2, 4, 8):
        shift = np.uint32(32 - bits)
        groups = {}
        for xi, yi in zip(xs >> shift, y >> shift):
            groups.setdefault(int(xi), set()).add(int(yi))
        # each input prefix maps to exactly one output prefix, bijectively
        outs = [next(iter(v)) for v in groups.values()]
        assert all(len(v) == 1 for v in groups.values())
        assert len(set(outs)) == len(groups)


W_, H_, SPP, DEPTH = 16, 8, 2, 4


def _render_pair(world, **kw):
    scene = compile_scene(world)
    jr = make_jnp_renderer(
        world.camera, W_, H_, SPP, DEPTH, sample_batch=SPP, **kw
    )
    pr = make_pallas_renderer(
        world.camera, W_, H_, SPP, DEPTH, tile_rows=8, interpret=True, **kw
    )
    a, sa = jr(scene, KEY, 0)
    b, sb = pr(scene, KEY, 0)
    return np.asarray(a), np.asarray(b), float(sa), float(sb)


@pytest.mark.slow
def test_oracle_kernel_parity_qmc():
    """The kernel consumes the same scrambled-Sobol stream as the oracle
    (defocus scene: both the jitter and the lens pairs are live)."""
    a, b, sa, sb = _render_pair(presets.defocus_scene(), qmc=True)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    assert sa == sb


def test_qmc_stream_differs_from_default():
    world = presets.reference_scene()
    scene = compile_scene(world)
    base = make_jnp_renderer(world.camera, W_, H_, SPP, DEPTH, sample_batch=SPP)
    qmc = make_jnp_renderer(
        world.camera, W_, H_, SPP, DEPTH, sample_batch=SPP, qmc=True
    )
    a, _ = base(scene, KEY, 0)
    b, _ = qmc(scene, KEY, 0)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_qmc_converges_faster_on_smooth_integrand():
    """Sky-only scene: the pixel integrand is a smooth function of the
    sub-pixel jitter alone, where a (0,2) net converges ~O(1/N) vs the
    threefry stream's O(1/sqrt(N)). At 16 spp the QMC error against a
    4096-spp reference must be well under half the uniform error."""
    world = World(spheres=[])  # every ray hits the sky gradient
    scene = compile_scene(world)
    ref_r = make_jnp_renderer(world.camera, 8, 4, 4096, 1, sample_batch=256)
    ref, _ = ref_r(scene, KEY, 0)
    ref = np.asarray(ref)

    def rmse(img):
        return float(np.sqrt(np.mean((np.asarray(img) - ref) ** 2)))

    uni_r = make_jnp_renderer(world.camera, 8, 4, 16, 1, sample_batch=16)
    qmc_r = make_jnp_renderer(world.camera, 8, 4, 16, 1, sample_batch=16, qmc=True)
    e_uni = rmse(uni_r(scene, KEY, 0)[0])
    e_qmc = rmse(qmc_r(scene, KEY, 0)[0])
    assert e_qmc < 0.5 * e_uni, (e_qmc, e_uni)


def test_qmc_means_agree_with_default():
    """Same estimator, different stream: high-spp images agree within
    sampling noise (QMC is unbiased — the scramble makes every point
    uniformly distributed)."""
    world = presets.reference_scene()
    scene = compile_scene(world)
    base = make_jnp_renderer(world.camera, 8, 4, 256, 6, sample_batch=64)
    qmc = make_jnp_renderer(world.camera, 8, 4, 256, 6, sample_batch=64, qmc=True)
    a, _ = base(scene, KEY, 0)
    b, _ = qmc(scene, KEY, 0)
    assert float(np.mean(np.abs(np.asarray(a) - np.asarray(b)))) < 0.02


def test_session_qmc_and_checkpoint_provenance(tmp_path):
    cfg = RenderConfig(
        width=16, height=8, samples_per_frame=2, ray_depth=4, qmc=True
    )
    world = presets.reference_scene()
    s = RenderSession(world, cfg)
    s.step()
    path = tmp_path / "q.npz"
    s.save_checkpoint(path)

    # Same stream resumes exactly.
    s2 = RenderSession(world, cfg)
    s2.load_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(s.framebuffer), np.asarray(s2.framebuffer)
    )

    # A default-stream session must refuse the QMC checkpoint.
    s3 = RenderSession(world, cfg.replace(qmc=False))
    with pytest.raises(ValueError, match="qmc"):
        s3.load_checkpoint(path)
