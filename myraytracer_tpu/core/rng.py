"""Counter-based RNG: threefry2x32 keyed on (pixel, sample, bounce).

The reference stores a xoshiro128+ state per pixel in a seed texture and
mutates it as it draws (``raytracer/src/lib.rs:389-497``,
``raytracer/src/shader.wgsl:36-94``). Stateful per-lane RNG is a poor fit
for a functional, re-orderable TPU program, so this framework replaces it
with the standard counter-based construction: every random draw is a pure
function ``threefry2x32(key, (lane_id, draw_id))``. Frames are
bit-reproducible for a given key regardless of batching, sharding, or
kernel implementation — the same stream is produced by the pure-jnp oracle
integrator and by Pallas kernels (which reuse these exact functions on
uint32 vectors).

The noise pattern therefore differs from the reference bit-for-bit; output
parity is statistical (per-pixel within sampling noise), as recorded in
SURVEY.md §7.2.

Rejection sampling (the unbounded loops at ``shader.wgsl:84-94``) is
replaced by analytic, branch-free sampling of the unit sphere / ball /
disk; the distributions are identical, only the sample stream differs.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from myraytracer_tpu.core.noise import lowbias32
from myraytracer_tpu.core.vec import V3

TAU = 6.283185307179586

# Draw-slot layout inside one (pixel, sample) stream. Each threefry call
# yields two u32 words, i.e. two uniforms. ``draw_id`` for a given sample is
# ``sample_id * DRAWS_PER_SAMPLE + slot``; slots 0-1 are camera draws, each
# bounce then owns DRAWS_PER_BOUNCE consecutive slots. One u32 "page" of
# slots covers bounces 0..MAX_DEPTH; deeper bounces reuse the same slot
# window under a per-page DERIVED key (:func:`depth_page_key`), so any u32
# ray depth is supported — matching the reference CLI contract
# (native-runner/src/main.rs:27-28 accepts any u32) — while depth <=
# MAX_DEPTH keeps the original single-page stream bitwise.
DRAWS_PER_BOUNCE = 4
CAMERA_DRAWS = 2
MAX_DEPTH = 62  # bounces per draw page (page 0 = the legacy layout)
BOUNCES_PER_PAGE = MAX_DEPTH + 1
DRAWS_PER_SAMPLE = CAMERA_DRAWS + DRAWS_PER_BOUNCE * BOUNCES_PER_PAGE  # 254


def _rotl32(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << r) | (x >> (32 - r))


_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)


def threefry2x32(
    key: Tuple[jnp.ndarray, jnp.ndarray],
    ctr: Tuple[jnp.ndarray, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Threefry-2x32, 20 rounds (Salmon et al., Random123).

    All inputs are uint32 scalars or arrays (broadcastable); returns two
    uint32 arrays. Matches the Random123 known-answer vectors and JAX's own
    threefry PRNG core.
    """
    k0 = jnp.asarray(key[0], jnp.uint32)
    k1 = jnp.asarray(key[1], jnp.uint32)
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(0x1BD11BDA))

    x0 = jnp.asarray(ctr[0], jnp.uint32) + ks[0]
    x1 = jnp.asarray(ctr[1], jnp.uint32) + ks[1]

    for r in range(20):
        x0 = x0 + x1
        x1 = _rotl32(x1, _ROTATIONS[r % 8])
        x1 = x1 ^ x0
        if (r + 1) % 4 == 0:
            j = (r + 1) // 4  # 1..5
            x0 = x0 + ks[j % 3]
            x1 = x1 + ks[(j + 1) % 3] + jnp.uint32(j)
    return x0, x1


def key_from_seed(seed: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a python int seed into a (u32, u32) key pair."""
    seed = int(seed) & 0xFFFFFFFFFFFFFFFF
    return (
        jnp.uint32((seed >> 32) & 0xFFFFFFFF),
        jnp.uint32(seed & 0xFFFFFFFF),
    )


def fold_key(key, data: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Derive a new key by hashing ``data`` under ``key`` (like fold_in)."""
    return threefry2x32(key, (jnp.uint32(data), jnp.uint32(0x9E3779B9)))


# Fold constant for the Russian-roulette decision stream: RR draws ride a
# DERIVED key over the same (lane, draw) counters, so they are independent
# of every main-stream draw without consuming a slot — enabling RR shifts
# nothing in the existing stream (slots 0-3 are all occupied under NEE).
RR_KEY_FOLD = 0x52524F55  # "RROU"

# Fold base for deep-bounce draw pages: page p >= 1 folds DEPTH_PAGE_FOLD+p.
# Collision-free with RR_KEY_FOLD for every reachable page: they'd collide
# at p = RR_KEY_FOLD - DEPTH_PAGE_FOLD ≈ 2.36e8, but a u32 ray depth caps
# pages at ceil(2^32 / 63) ≈ 6.8e7.
DEPTH_PAGE_FOLD = 0x44455054  # "DEPT"


def depth_page_key(key, page):
    """Key for draw page ``page`` (u32 scalar or array).

    Bounce ``i`` draws on page ``i // BOUNCES_PER_PAGE`` at the local slot
    window of ``i % BOUNCES_PER_PAGE``. Page 0 IS the main key — the
    legacy stream for bounces 0..MAX_DEPTH stays bitwise identical — and
    page p >= 1 derives an independent key, so cross-page draw-id reuse is
    collision-free. Vector ``page`` (the Pallas kernel's per-lane bounce
    counters) broadcasts fine: all threefry ops are elementwise.
    """
    p = jnp.asarray(page, jnp.uint32)
    fk0, fk1 = threefry2x32(
        key, (p + jnp.uint32(DEPTH_PAGE_FOLD), jnp.uint32(0x9E3779B9))
    )
    is_main = p == jnp.uint32(0)
    return (jnp.where(is_main, key[0], fk0), jnp.where(is_main, key[1], fk1))


def _to_unit_f32(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 → float32 uniform in [0, 1).

    Uses the top 24 bits so the result is exactly representable and strictly
    below 1.0 (the reference's ``f32(i) / 2^32`` at shader.wgsl:68 can round
    up to 1.0; we keep the half-open interval instead).

    The intermediate int32 cast is exact (24-bit value) and keeps the code
    Mosaic-compatible (TPU Pallas has no uint32→f32 cast).
    """
    hi24 = (bits >> jnp.uint32(8)).astype(jnp.int32)
    return hi24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def uniform2(key, lane_id: jnp.ndarray, draw_id) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two independent U[0,1) floats per lane for the given draw slot."""
    d = jnp.asarray(draw_id, jnp.uint32)
    b0, b1 = threefry2x32(key, (jnp.asarray(lane_id, jnp.uint32), d))
    return _to_unit_f32(b0), _to_unit_f32(b1)


def unit_sphere_from_uniforms(u1: jnp.ndarray, u2: jnp.ndarray) -> V3:
    """Uniform direction on the unit sphere from two U[0,1) draws."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = jnp.float32(TAU) * u2
    return V3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def _cbrt01(u: jnp.ndarray) -> jnp.ndarray:
    """Cube root on [0,1] via exp2/log2 (Mosaic has no cbrt primitive).

    Used by both the jnp oracle and Pallas kernels so their sample streams
    stay bitwise identical.
    """
    r = jnp.exp2(jnp.log2(jnp.maximum(u, jnp.float32(1e-38))) * jnp.float32(1.0 / 3.0))
    return jnp.where(u <= 0.0, jnp.float32(0.0), r)


def unit_ball_from_uniforms(u1: jnp.ndarray, u2: jnp.ndarray, u3: jnp.ndarray) -> V3:
    """Uniform point inside the unit ball from three U[0,1) draws."""
    s = unit_sphere_from_uniforms(u1, u2)
    return s * _cbrt01(u3)


def unit_disk_from_uniforms(u1: jnp.ndarray, u2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform point inside the unit disk (for thin-lens defocus)."""
    r = jnp.sqrt(u1)
    phi = jnp.float32(TAU) * u2
    return r * jnp.cos(phi), r * jnp.sin(phi)


# -- Low-discrepancy camera sampling (the opt-in ``qmc`` config knob) --------
#
# The camera dimensions (sub-pixel jitter; lens disk) dominate a pixel
# estimator's variance structure, and pure-random draws leave 1/sqrt(N)
# clumping there. When QMC is enabled, those two dimension PAIRS come from
# a Sobol (0,2) sequence indexed by the per-pixel sample counter instead of
# threefry: every prefix of 4^k consecutive samples per pixel is perfectly
# stratified over the pixel footprint (and the lens disk), which converges
# faster on smooth integrands. Randomization follows Burley's hash-based
# Owen scrambling ("Practical Hash-based Owen Scrambling", JCGT 2020):
# per (pixel, dimension-pair) the sample *index* is Owen-shuffled and each
# output dimension is Owen-scrambled under independent seeds derived from
# the render key. The index shuffle is what decorrelates the padded jitter
# and lens pairs — with a plain digital shift both pairs would read the
# SAME Sobol point XOR a constant, collapsing the 4-D camera sample set
# onto a 2-D manifold per pixel. Owen scrambling maps elementary intervals
# onto elementary intervals, so (0,2)-net stratification survives for every
# power-of-2 prefix, neighbouring pixels stay decorrelated, and determinism
# is preserved (pure function of key/pixel/sample — batching/sharding/
# backend invariant, like every other draw). Bounce-dimension draws stay
# threefry: QMC gains decay fast past the first few dimensions and path
# regeneration makes per-bounce Sobol indexing pay bookkeeping for nothing.
#
# Both integrator paths (jnp oracle; Pallas megakernel) call these exact
# functions, so QMC frames are bitwise identical across backends, exactly
# like the default stream.

# Direction vectors of the canonical second Sobol dimension. All 32 index
# bits are honored: the Owen index shuffle maps sample ids across the full
# uint32 range, and it also keeps the generator exact for any cursor the
# session's uint32 draw-space guard admits (~16.9M samples/pixel).
QMC_BITS = 32
_SOBOL2_DIRS = []
_d = 1 << 31
for _ in range(QMC_BITS):
    _SOBOL2_DIRS.append(_d)
    _d ^= _d >> 1
del _d

# Reserved draw-slot words for the scramble derivation (one threefry per
# camera pair, same cost as the uniform draws QMC replaces). The session
# cursor guard keeps real draw ids clear of these.
QMC_SCRAMBLE_SLOTS = 2


def _reverse_bits32(v: jnp.ndarray) -> jnp.ndarray:
    """Bitwise reversal of a uint32 (the van der Corput radical inverse)."""
    v = jnp.asarray(v, jnp.uint32)
    v = ((v & jnp.uint32(0x0000FFFF)) << 16) | (v >> 16)
    v = ((v & jnp.uint32(0x00FF00FF)) << 8) | ((v >> 8) & jnp.uint32(0x00FF00FF))
    v = ((v & jnp.uint32(0x0F0F0F0F)) << 4) | ((v >> 4) & jnp.uint32(0x0F0F0F0F))
    v = ((v & jnp.uint32(0x33333333)) << 2) | ((v >> 2) & jnp.uint32(0x33333333))
    v = ((v & jnp.uint32(0x55555555)) << 1) | ((v >> 1) & jnp.uint32(0x55555555))
    return v


def _sobol2_bits(n: jnp.ndarray) -> jnp.ndarray:
    """Canonical second Sobol dimension of index ``n`` as raw uint32 bits.

    Direction-number XOR fold, unrolled over all 32 index bits — vector
    select/xor ops only, Mosaic-compatible.
    """
    n = jnp.asarray(n, jnp.uint32)
    y = jnp.zeros_like(n)
    zero = jnp.uint32(0)
    for b, dv in enumerate(_SOBOL2_DIRS):
        bit = (n >> jnp.uint32(b)) & jnp.uint32(1)
        y = y ^ jnp.where(bit != zero, jnp.uint32(dv), zero)
    return y


def sobol02(
    n: jnp.ndarray, scramble0: jnp.ndarray, scramble1: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XOR-scrambled Sobol (0,2) pair for sample index ``n`` (uint32).

    Dimension 0 is the van der Corput sequence (bit reversal); dimension 1
    is the canonical second Sobol dimension. The scramble words are plain
    digital shifts (see ``qmc_camera_uniforms`` for the stronger Owen
    randomization the renderer actually uses). Returns two U[0,1) float32
    arrays.
    """
    n = jnp.asarray(n, jnp.uint32)
    x = _reverse_bits32(n) ^ jnp.asarray(scramble0, jnp.uint32)
    y = _sobol2_bits(n) ^ jnp.asarray(scramble1, jnp.uint32)
    return _to_unit_f32(x), _to_unit_f32(y)


def _laine_karras(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Laine–Karras permutation: an Owen scramble in reversed-bit order.

    Bit i of the output depends only on bits 0..i of the input (carries and
    the ``x * even`` products propagate strictly upward), which is exactly
    the nested-interval structure Owen scrambling requires. Constants from
    Burley, "Practical Hash-based Owen Scrambling" (JCGT 2020) — a
    published algorithm, not copied code. u32 add/mul/xor only (the same
    vector ops core/noise.py's lattice hash already lowers under Mosaic).
    """
    x = jnp.asarray(x, jnp.uint32) + jnp.asarray(seed, jnp.uint32)
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def owen_scramble(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Hash-based Owen (nested uniform) scramble of uint32 fraction bits."""
    return _reverse_bits32(_laine_karras(_reverse_bits32(x), seed))


def qmc_camera_uniforms(
    key, lane_id: jnp.ndarray, sample_id: jnp.ndarray, pair: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Owen-scrambled Sobol camera pair: ``pair`` 0 = sub-pixel jitter,
    1 = lens.

    Per (pixel, pair) the sample index is Owen-shuffled and each output
    dimension Owen-scrambled under independent seeds derived from the
    render key (reserved top draw words + lowbias32 splits). The index
    shuffle decorrelates the padded jitter/lens planes — each pair sees a
    different power-of-2-aligned block of the Sobol sequence — while every
    power-of-2 sample prefix per pair remains a (0,2)-net.
    """
    s0, s1 = threefry2x32(
        key,
        (jnp.asarray(lane_id, jnp.uint32), jnp.uint32(0xFFFFFFFE + pair)),
    )
    idx = owen_scramble(jnp.asarray(sample_id, jnp.uint32), s0)
    x = owen_scramble(_reverse_bits32(idx), s1)
    y = owen_scramble(_sobol2_bits(idx), lowbias32(s1))
    return _to_unit_f32(x), _to_unit_f32(y)


def unit_sphere(key, lane_id, draw_id) -> V3:
    u1, u2 = uniform2(key, lane_id, draw_id)
    return unit_sphere_from_uniforms(u1, u2)


def unit_ball(key, lane_id, draw_id) -> V3:
    """Uniform unit-ball sample; consumes two consecutive draw slots."""
    u1, u2 = uniform2(key, lane_id, draw_id)
    u3, _ = uniform2(key, lane_id, jnp.asarray(draw_id, jnp.uint32) + jnp.uint32(1))
    return unit_ball_from_uniforms(u1, u2, u3)
