"""RNG unit tests: known-answer vectors, reproducibility, distributions."""

import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.core import rng


def _u32(x):
    return jnp.uint32(x)


def test_threefry_known_answer_vectors():
    # Random123 kat_vectors, threefry2x32 20 rounds: (key, ctr) -> out.
    cases = [
        ((0, 0), (0, 0), (0x6B200159, 0x99BA4EFE)),
        (
            (0xFFFFFFFF, 0xFFFFFFFF),
            (0xFFFFFFFF, 0xFFFFFFFF),
            (0x1CB996FC, 0xBB002BE7),
        ),
        (
            (0x13198A2E, 0x03707344),
            (0x243F6A88, 0x85A308D3),
            (0xC4923A9C, 0x483DF7A0),
        ),
    ]
    for key, ctr, want in cases:
        got = rng.threefry2x32(
            (_u32(key[0]), _u32(key[1])), (_u32(ctr[0]), _u32(ctr[1]))
        )
        assert (int(got[0]), int(got[1])) == want


def test_threefry_matches_jax_prng():
    # Cross-check the vectorized implementation against JAX's own threefry.
    try:
        from jax._src import prng as jax_prng
    except ImportError:
        return
    key = jnp.array([123, 456], jnp.uint32)
    count = jnp.arange(64, dtype=jnp.uint32)
    ours0, ours1 = rng.threefry2x32(
        (key[0], key[1]),
        (count, jnp.zeros_like(count)),
    )
    theirs = jax_prng.threefry_2x32(key, jnp.concatenate([count, jnp.zeros_like(count)]))
    np.testing.assert_array_equal(np.asarray(ours0), np.asarray(theirs[:64]))
    np.testing.assert_array_equal(np.asarray(ours1), np.asarray(theirs[64:]))


def test_reproducible_and_batch_invariant():
    key = rng.key_from_seed(42)
    lanes = jnp.arange(1000, dtype=jnp.uint32)
    a1, b1 = rng.uniform2(key, lanes, 7)
    a2, b2 = rng.uniform2(key, lanes, 7)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # Same lane in a different batch slicing gives the same value.
    a_sub, _ = rng.uniform2(key, lanes[100:200], 7)
    np.testing.assert_array_equal(np.asarray(a1)[100:200], np.asarray(a_sub))


def test_uniform_range_and_mean():
    key = rng.key_from_seed(1)
    lanes = jnp.arange(200_000, dtype=jnp.uint32)
    u, v = rng.uniform2(key, lanes, 0)
    u, v = np.asarray(u), np.asarray(v)
    for arr in (u, v):
        assert arr.min() >= 0.0 and arr.max() < 1.0
        assert abs(arr.mean() - 0.5) < 0.005
        assert abs(arr.var() - 1.0 / 12.0) < 0.001


def test_unit_sphere_distribution():
    key = rng.key_from_seed(2)
    lanes = jnp.arange(100_000, dtype=jnp.uint32)
    s = rng.unit_sphere(key, lanes, 0)
    lens = np.asarray(s.length())
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    # Component means ~0; E[z^2] = 1/3 for uniform sphere.
    for c in (s.x, s.y, s.z):
        c = np.asarray(c)
        assert abs(c.mean()) < 0.01
        assert abs((c**2).mean() - 1.0 / 3.0) < 0.01


def test_unit_ball_distribution():
    key = rng.key_from_seed(3)
    lanes = jnp.arange(100_000, dtype=jnp.uint32)
    b = rng.unit_ball(key, lanes, 0)
    r = np.asarray(b.length())
    assert r.max() <= 1.0 + 1e-6
    # E[r] for uniform ball = 3/4; E[r^2] = 3/5.
    assert abs(r.mean() - 0.75) < 0.01
    assert abs((r**2).mean() - 0.6) < 0.01


def test_unit_disk_distribution():
    key = rng.key_from_seed(4)
    lanes = jnp.arange(100_000, dtype=jnp.uint32)
    u1, u2 = rng.uniform2(key, lanes, 0)
    dx, dy = rng.unit_disk_from_uniforms(u1, u2)
    r = np.sqrt(np.asarray(dx) ** 2 + np.asarray(dy) ** 2)
    assert r.max() <= 1.0 + 1e-6
    # E[r] for uniform disk = 2/3.
    assert abs(r.mean() - 2.0 / 3.0) < 0.01


def test_fold_key_changes_stream():
    key = rng.key_from_seed(5)
    k2 = rng.fold_key(key, 1)
    lanes = jnp.arange(100, dtype=jnp.uint32)
    a, _ = rng.uniform2(key, lanes, 0)
    b, _ = rng.uniform2(k2, lanes, 0)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
