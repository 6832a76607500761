"""Tableless procedural noise (exact integer-hash lattice noise).

RTiOW book 2 ch. 5 builds Perlin noise from three 256-entry permutation
tables and a random-gradient table, indexed per hit point. Per-lane table
gathers do not vectorize on the TPU VPU (Mosaic has no dynamic lane
indexing), so this module replaces the tables with a *computed* lattice
hash — the TPU-native formulation:

* lattice corner values come from ``lowbias32`` (a public-domain 32-bit
  integer mixer) over the integer lattice coordinates — pure u32
  multiply/xor/shift vector ops, no memory;
* the smooth interpolant is the same Hermite cubic the book uses;
* the marble band uses an exact triangle wave instead of ``sin`` —
  transcendental lowerings differ between Mosaic and XLA, and the band
  shape (not its exact curve) is what makes marble read as marble, so the
  triangle wave keeps the Pallas kernel and the jnp oracle bitwise
  identical.

Everything here is shape-generic jnp on f32/u32 arrays and lowers under
both XLA and Mosaic. No RNG draws are consumed (noise is a pure function
of position), so textures never shift the sample stream.
"""

from __future__ import annotations

import jax.numpy as jnp

from myraytracer_tpu.core.vec import V3

# Octaves of the turbulence sum (RTiOW book 2 uses 7).
TURBULENCE_OCTAVES = 7


def lowbias32(h: jnp.ndarray) -> jnp.ndarray:
    """lowbias32: a well-distributed 32-bit integer finalizer (u32 → u32)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> jnp.uint32(16))
    return h


def hash3(ix: jnp.ndarray, iy: jnp.ndarray, iz: jnp.ndarray) -> jnp.ndarray:
    """u32 hash of integer lattice coordinates (i32 arrays, wrapping)."""
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(0x8DA6B343)
        ^ iy.astype(jnp.uint32) * jnp.uint32(0xD8163841)
        ^ iz.astype(jnp.uint32) * jnp.uint32(0xCB1AB31F)
    )
    return lowbias32(h)


def _corner(ix, iy, iz) -> jnp.ndarray:
    """Lattice corner value in [0, 1): top 24 hash bits scaled (exact).

    The 24-bit value converts via int32 — Mosaic has no u32→f32 cast
    (same detour as the kernel's hardware-PRNG path).
    """
    h24 = (hash3(ix, iy, iz) >> jnp.uint32(8)).astype(jnp.int32)
    return h24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def value_noise(p: V3) -> jnp.ndarray:
    """Smooth lattice value noise in [0, 1) (analog of book-2 perlin.h).

    Integer lattice cell from ``floor``, Hermite-cubic (smoothstep)
    interpolation of the 8 hashed corner values — the same structure as
    the book's trilinear perlin interp, with the permutation tables
    replaced by the computed hash.
    """
    fx, fy, fz = jnp.floor(p.x), jnp.floor(p.y), jnp.floor(p.z)
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    tx, ty, tz = p.x - fx, p.y - fy, p.z - fz
    ux = tx * tx * (3.0 - 2.0 * tx)
    uy = ty * ty * (3.0 - 2.0 * ty)
    uz = tz * tz * (3.0 - 2.0 * tz)
    one = jnp.int32(1)

    c000 = _corner(ix, iy, iz)
    c100 = _corner(ix + one, iy, iz)
    c010 = _corner(ix, iy + one, iz)
    c110 = _corner(ix + one, iy + one, iz)
    c001 = _corner(ix, iy, iz + one)
    c101 = _corner(ix + one, iy, iz + one)
    c011 = _corner(ix, iy + one, iz + one)
    c111 = _corner(ix + one, iy + one, iz + one)

    x00 = c000 + ux * (c100 - c000)
    x10 = c010 + ux * (c110 - c010)
    x01 = c001 + ux * (c101 - c001)
    x11 = c011 + ux * (c111 - c011)
    y0 = x00 + uy * (x10 - x00)
    y1 = x01 + uy * (x11 - x01)
    return y0 + uz * (y1 - y0)


def turbulence(p: V3, octaves: int = TURBULENCE_OCTAVES) -> jnp.ndarray:
    """Sum of halved-weight, doubled-frequency noise octaves, in ~[0, 1).

    Book-2 ``perlin::turb`` semantics (7 octaves, |accumulated signed
    noise|) over the hash noise: each octave contributes
    ``0.5^(k+1) * (2*noise(2^k p) - 1)``.
    """
    acc = None
    weight = 0.5
    freq = 1.0
    for _ in range(octaves):
        n = value_noise(p * freq) * 2.0 - 1.0
        acc = n * weight if acc is None else acc + n * weight
        weight *= 0.5
        freq *= 2.0
    return jnp.abs(acc)


def triangle_wave(x: jnp.ndarray) -> jnp.ndarray:
    """Exact triangle wave in [-1, 1] with period 4 (``sin``-band stand-in).

    ``triangle_wave(0) = 1`` (peak); exact arithmetic (one floor, one abs)
    so the Pallas and XLA lowerings agree bitwise, unlike transcendental
    ``sin``.
    """
    u = x * 0.25
    u = u - jnp.floor(u)
    return jnp.abs(u * 4.0 - 2.0) - 1.0
