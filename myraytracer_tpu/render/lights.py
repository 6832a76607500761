"""Next-event estimation: direct-light sampling (opt-in extension).

The reference (and base RTiOW) integrator finds lights only by randomly
scattering into them — on emissive scenes (``DiffuseLight`` under a black
``World.ambient``) that converges extremely slowly. NEE samples one light
explicitly at every diffuse hit and adds its unoccluded contribution:

    L_direct = throughput * (albedo/pi) * emit * cos(theta) / pdf * N

with one shadow ray per diffuse bounce. Double counting is avoided the
standard way (RTiOW book 3 ch. 8-12 semantics, without MIS): a lane that
just *diffuse*-scattered suppresses emission pickup on its next hit
(NEE already accounted for that light), while specular (metal/dielectric)
paths keep pickup. Every light-carrying path is sampled by exactly one
technique, so the estimator stays unbiased.

Draw slots: NEE consumes the spare per-bounce slot 3 (two words) for the
light-point sample, and the dielectric word (slot 2, second word — unused
by diffuse lanes) for the light pick. Slots are absolute, so slots 0-2
keep their exact non-NEE values; the NEE estimator is a different stream
by definition (opt-in, ``RenderConfig.nee``).

Lights are extracted host-side from the World as STATIC python floats
(:func:`extract_lights`) and baked into the compiled program — scenes have
a handful of lights, so no device tables are needed, and the same
constants serve the jnp oracle and the Pallas kernel identically
(bitwise-parity contract).

Everything here is elementwise jnp on V3 lanes, so it runs unchanged
inside Pallas kernel bodies.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.scene import api

INV_PI = 1.0 / math.pi
# Shadow-ray slack: the sampled point lies ON the light, so the shadow
# trace re-hits the light itself at ~t_point; anything strictly nearer
# (with relative slack for fp) is an occluder.
SHADOW_EPS = 1e-3


def extract_lights(world: api.World) -> Tuple[tuple, ...]:
    """Static light list from the API world (order: spheres, then mesh
    triangles — independent of the compiled scene's Morton order).

    Entries: ``("sphere", (cx,cy,cz), r, (er,eg,eb))`` or
    ``("tri", v0, e1, e2, (er,eg,eb))``.
    """
    lights = []
    for s in world.spheres:
        if s.material.type_id == api.MATERIAL_LIGHT:
            lights.append((
                "sphere",
                tuple(float(c) for c in s.center),
                abs(float(s.radius)),
                tuple(float(c) for c in s.material.emit),
            ))
    for m in world.meshes:
        if m.material.type_id != api.MATERIAL_LIGHT:
            continue
        emit = tuple(float(c) for c in m.material.emit)
        for (a, b, c) in m.triangles:
            v0 = m.vertices[a]
            v1 = m.vertices[b]
            v2 = m.vertices[c]
            e1 = tuple(v1[i] - v0[i] for i in range(3))
            e2 = tuple(v2[i] - v0[i] for i in range(3))
            lights.append(("tri", tuple(v0), e1, e2, emit))
    return tuple(lights)


def _onb(w: V3):
    """Branchless orthonormal basis around unit ``w`` (per-lane select).

    NaN-free even for degenerate ``w`` (masked-off lanes still flow
    values through the kernel's gates and the --debug-nans contract):
    the normalize is epsilon-guarded.
    """
    use_y = jnp.abs(w.x) > 0.9
    ax = jnp.where(use_y, 0.0, 1.0)
    ay = jnp.where(use_y, 1.0, 0.0)
    a = V3(ax, ay, jnp.zeros_like(ax))
    u = a.cross(w)
    inv = jax.lax.rsqrt(jnp.maximum(u.length_sq(), jnp.float32(1e-24)))
    u = u * inv
    v = w.cross(u)
    return u, v


def _sample_one(light, p: V3, u1, u2):
    """Direction sample toward one static light from points ``p``.

    Returns ``(omega unit V3, t_point, inv_pdf, ok mask, emit tuple)``:
    ``t_point`` is the distance at which the shadow ray meets the light;
    ``inv_pdf`` is 1/pdf of ``omega`` (solid-angle measure); ``ok`` masks
    lanes where the sample is usable (outside a sphere light, non-grazing
    triangle).
    """
    kind = light[0]
    if kind == "sphere":
        _, (cx, cy, cz), r, emit = light
        lv = V3(cx - p.x, cy - p.y, cz - p.z)
        d2 = lv.length_sq()
        d = jnp.sqrt(d2)
        ok = d2 > (r * r) * (1.0 + 1e-6)  # inside → pickup handles it
        inv_d2 = 1.0 / jnp.maximum(d2, 1e-12)
        cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - (r * r) * inv_d2))
        cos_t = 1.0 + u1 * (cos_max - 1.0)
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
        phi = (2.0 * math.pi) * u2
        w = lv * (1.0 / jnp.maximum(d, 1e-12))
        ub, vb = _onb(w)
        omega = ub * (sin_t * jnp.cos(phi)) + vb * (sin_t * jnp.sin(phi)) \
            + w * cos_t
        # Near intersection of the cone ray with the light sphere.
        t_point = d * cos_t - jnp.sqrt(
            jnp.maximum(0.0, r * r - d2 * (1.0 - cos_t * cos_t))
        )
        solid = (2.0 * math.pi) * (1.0 - cos_max)
        ok = ok & (solid > 1e-9)
        inv_pdf = solid  # pdf = 1/solid-angle (uniform cone)
        return omega, t_point, inv_pdf, ok, emit
    if kind == "tri":
        _, v0, e1, e2, emit = light
        # Uniform point on the triangle (fold the unit square).
        flip = u1 + u2 > 1.0
        su = jnp.where(flip, 1.0 - u1, u1)
        sv = jnp.where(flip, 1.0 - u2, u2)
        qx = v0[0] + su * e1[0] + sv * e2[0]
        qy = v0[1] + su * e1[1] + sv * e2[1]
        qz = v0[2] + su * e1[2] + sv * e2[2]
        lv = V3(qx - p.x, qy - p.y, qz - p.z)
        d2 = lv.length_sq()
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        omega = lv * (1.0 / d)
        # Static geometric normal / area (host floats).
        nx = e1[1] * e2[2] - e1[2] * e2[1]
        ny = e1[2] * e2[0] - e1[0] * e2[2]
        nz = e1[0] * e2[1] - e1[1] * e2[0]
        nlen = math.sqrt(nx * nx + ny * ny + nz * nz)
        area = 0.5 * nlen
        inv_nlen = 1.0 / max(nlen, 1e-12)
        cos_l = jnp.abs(
            omega.x * (nx * inv_nlen)
            + omega.y * (ny * inv_nlen)
            + omega.z * (nz * inv_nlen)
        )
        ok = (cos_l > 1e-4) & (d2 > 1e-9)
        # pdf_omega = d^2 / (cos_l * area)  →  inv_pdf = cos_l * area / d^2
        inv_pdf = cos_l * (area / jnp.maximum(d2, 1e-12))
        return omega, d, inv_pdf, ok, emit
    raise ValueError(f"unknown light kind {light[0]!r}")


def sample_lights(
    lights, p: V3, n: V3, pick_u, u1, u2
) -> Tuple[V3, jnp.ndarray, V3, jnp.ndarray, jnp.ndarray]:
    """Pick one light uniformly and sample it (compute-all-select — the
    light count is a static handful, and selects keep the jnp oracle and
    the Pallas kernel bitwise-identical).

    Returns ``(omega, t_point, weight V3, add, usable)``. ``weight`` is
    ``emit * cos(theta) * inv_pdf * n_lights / pi`` — multiply by
    ``throughput * albedo``, mask by ``add`` and the shadow test for the
    direct contribution at a Lambertian hit with normal ``n``.

    ``usable`` is True only where EVERY light is structurally sampleable
    from ``p`` (e.g. the point is not inside a sphere light). Where it is
    False the caller must skip NEE entirely AND keep emission pickup for
    the next hit (pure BSDF estimator at that bounce) — suppressing
    pickup for a light NEE cannot account for would silently lose its
    energy. Each bounce thus uses exactly one unbiased estimator,
    selected by a deterministic property of the shading point.
    """
    nl = len(lights)
    pick = jnp.minimum(
        (pick_u * float(nl)).astype(jnp.int32), jnp.int32(nl - 1)
    )
    zero = jnp.zeros_like(u1)
    omega = V3(zero, zero, zero + 1.0)
    t_point = zero
    weight = V3(zero, zero, zero)
    add = zero > 1.0  # all-False
    usable = zero < 1.0  # all-True
    for i, light in enumerate(lights):
        o_i, t_i, inv_pdf_i, ok_i, emit = _sample_one(light, p, u1, u2)
        cos_i = o_i.dot(n)
        w_scale = cos_i * inv_pdf_i * (float(nl) * INV_PI)
        sel = pick == jnp.int32(i)
        omega = V3.where(sel, o_i, omega)
        t_point = jnp.where(sel, t_i, t_point)
        weight = V3.where(
            sel,
            V3(emit[0] * w_scale, emit[1] * w_scale, emit[2] * w_scale),
            weight,
        )
        # cos <= 0 is a zero-integrand sample (NEE still covers the
        # light in expectation); ok_i False is structural.
        add = add | (sel & ok_i & (cos_i > 0.0))
        usable = usable & ok_i
    add = add & usable
    # Masked-off lanes must still carry finite values (their omega feeds
    # the shadow sweep's gates before the mask applies).
    omega = V3.where(add, omega, V3(zero, zero, zero + 1.0))
    t_point = jnp.where(add, t_point, 1.0)
    weight = V3.where(add, weight, V3(zero, zero, zero))
    return omega, t_point, weight, add, usable
