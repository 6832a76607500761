"""Component-SoA 3-vectors.

On TPU the natural layout for per-ray vector quantities is three separate
arrays (struct-of-arrays over the lane axis), not a trailing ``[..., 3]``
axis: a trailing 3 would occupy 3 of the VPU's 128 lanes and waste the rest.
``V3`` is a pytree (NamedTuple) of three same-shaped arrays, with vector
algebra defined component-wise; all operations are elementwise over the lane
shape and fuse freely under XLA, and the same code runs inside Pallas
kernels.

This replaces the reference's ``vec3<f32>`` usage throughout
``raytracer/src/shader.wgsl`` (e.g. ``reflect``, ``normalize``, ``mix``).
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp

Scalar = Union[float, int, "jnp.ndarray"]


class V3(NamedTuple):
    """A 3-vector stored as three same-shaped component arrays."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- constructors -------------------------------------------------------

    @staticmethod
    def full(shape, value: float, dtype=jnp.float32) -> "V3":
        v = jnp.full(shape, value, dtype)
        return V3(v, v, v)

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "V3":
        return V3.full(shape, 0.0, dtype)

    @staticmethod
    def ones(shape, dtype=jnp.float32) -> "V3":
        return V3.full(shape, 1.0, dtype)

    @staticmethod
    def const(x: float, y: float, z: float, dtype=jnp.float32) -> "V3":
        return V3(jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype))

    @staticmethod
    def from_stacked(a: jnp.ndarray, axis: int = -1) -> "V3":
        """Build from an array with a size-3 axis (host-interchange only)."""
        parts = jnp.moveaxis(a, axis, 0)
        return V3(parts[0], parts[1], parts[2])

    def stacked(self, axis: int = -1) -> jnp.ndarray:
        """Materialize as an array with a size-3 axis (host-interchange only)."""
        return jnp.stack([self.x, self.y, self.z], axis=axis)

    # -- algebra -------------------------------------------------------------

    def __add__(self, o: "V3") -> "V3":
        return V3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "V3") -> "V3":
        return V3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __neg__(self) -> "V3":
        return V3(-self.x, -self.y, -self.z)

    def __mul__(self, o: Union["V3", Scalar]) -> "V3":
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    def __rmul__(self, o: Scalar) -> "V3":
        return V3(self.x * o, self.y * o, self.z * o)

    def dot(self, o: "V3") -> jnp.ndarray:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "V3") -> "V3":
        return V3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_sq(self) -> jnp.ndarray:
        return self.dot(self)

    def length(self) -> jnp.ndarray:
        return jnp.sqrt(self.length_sq())

    def normalize(self) -> "V3":
        # Matches WGSL normalize(): no epsilon guard; a zero vector yields
        # inf/nan, same as the reference device code.
        inv = 1.0 / jnp.sqrt(self.dot(self))
        return V3(self.x * inv, self.y * inv, self.z * inv)

    # -- helpers -------------------------------------------------------------

    @staticmethod
    def where(mask: jnp.ndarray, a: "V3", b: "V3") -> "V3":
        return V3(
            jnp.where(mask, a.x, b.x),
            jnp.where(mask, a.y, b.y),
            jnp.where(mask, a.z, b.z),
        )


def reflect(d: V3, n: V3) -> V3:
    """Mirror reflection, matching WGSL ``reflect`` (shader.wgsl:230)."""
    return d - 2.0 * d.dot(n) * n


def lerp(a: V3, b: V3, t) -> V3:
    """WGSL ``mix(a, b, t)`` (shader.wgsl:333)."""
    return a + (b - a) * t
