"""Next-event estimation with MIS: direct-light sampling (opt-in).

The reference (and base RTiOW) integrator finds lights only by randomly
scattering into them — on emissive scenes (``DiffuseLight`` under a black
``World.ambient``) that converges extremely slowly. NEE samples one light
explicitly at every diffuse hit (one shadow ray per diffuse bounce) and
combines the two techniques with **multiple importance sampling** (the
balance heuristic — RTiOW book 3's mixture-PDF treatment in its
variance-optimal form):

* the shadow-ray contribution is ``throughput * (albedo/pi) * emit * cos
  / (q + p_B)`` where ``q`` is the light technique's solid-angle density
  (per-light pdf / N for the uniform light pick) and ``p_B = cos/pi`` is
  the cosine-lobe BSDF pdf of the same direction — the one-sample balance
  heuristic collapses weight/pdf into a single denominator;
* a BSDF path from a diffuse vertex that reaches a light keeps its
  emission pickup *weighted* by ``p_B / (p_B + q(omega))``, with ``q``
  evaluated for the direction actually traced (:func:`light_pdf_at_hit`).

The weights of the two techniques sum to one for every light-carrying
path, so the estimator is unbiased, and each contribution is individually
bounded (``<= albedo * emit`` for the shadow ray) — this removes the
near-light / grazing-geometry fireflies that plain
one-technique-per-path NEE keeps. Specular (metal/dielectric) vertices
have delta/intractable pdfs and keep full-weight pickup (``q`` never
applies: the carried BSDF pdf is 0 there), exactly book 3's "specular
materials skip the mixture" rule.

Where the light sampler cannot generate a path at all (shading point
inside a sphere light; grazing triangle below the sampler's threshold),
its pdf is 0 on both sides of the mixture, so the BSDF technique's
weight is exactly 1 and no energy is lost — the structural ``ok`` masks
and the pdf evaluation mirror each other by construction.

Draw slots: NEE consumes the spare per-bounce slot 3 (two words) for the
light-point sample, and the dielectric word (slot 2, second word — unused
by diffuse lanes) for the light pick. Slots are absolute, so slots 0-2
keep their exact non-NEE values; MIS adds no draws (its weights are
deterministic), but the estimator is a different *image* than both plain
NEE and brute force, so it is checkpoint provenance
(``render/session.py`` records ``nee_estimator: "mis"``).

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


# Relative tolerance for matching a BSDF-path hit distance against a
# light's analytic re-intersection in light_pdf_at_hit. The hit IS on the
# light's surface, so the match is exact up to fp — only a coincidentally
# overlapping second light could alias, and then only at the shared
# surface.
PICKUP_T_TOL = 1e-3


def _tri_consts(v0, e1, e2):
    """Static (host-float) normal direction, length, and area of a tri."""
    nx = e1[1] * e2[2] - e1[2] * e2[1]
    ny = e1[2] * e2[0] - e1[0] * e2[2]
    nz = e1[0] * e2[1] - e1[1] * e2[0]
    nlen = math.sqrt(nx * nx + ny * ny + nz * nz)
    area = 0.5 * nlen
    inv_nlen = 1.0 / max(nlen, 1e-12)
    return (nx * inv_nlen, ny * inv_nlen, nz * inv_nlen), nlen, area


def _sample_one(light, p: V3, u1, u2):
    """Direction sample toward one static light from points ``p``.

    Returns ``(omega unit V3, t_point, pdf, ok mask, emit tuple)``:
    ``t_point`` is the distance at which the shadow ray meets the light;
    ``pdf`` is the density of ``omega`` in solid-angle measure (before the
    1/N light-pick factor); ``ok`` masks lanes where the sample is usable
    (outside a sphere light, non-grazing triangle) — where it is False the
    technique's density is 0 and :func:`light_pdf_at_hit` mirrors that,
    so the BSDF technique's MIS weight is 1 there and no energy is lost.
    """
    kind = light[0]
    if kind == "sphere":
        _, (cx, cy, cz), r, emit = light
        lv = V3(cx - p.x, cy - p.y, cz - p.z)
        d2 = lv.length_sq()
        d = jnp.sqrt(d2)
        ok = d2 > (r * r) * (1.0 + 1e-6)  # inside → pure-BSDF estimator
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
        pdf = 1.0 / jnp.maximum(solid, 1e-12)  # uniform cone
        return omega, t_point, pdf, ok, emit
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
        (nux, nuy, nuz), _, area = _tri_consts(v0, e1, e2)
        cos_l = jnp.abs(omega.x * nux + omega.y * nuy + omega.z * nuz)
        ok = (cos_l > 1e-4) & (d2 > 1e-9)
        # Area measure → solid angle: pdf_omega = d^2 / (cos_l * area).
        pdf = d2 / jnp.maximum(cos_l * area, 1e-12)
        return omega, d, pdf, ok, emit
    raise ValueError(f"unknown light kind {light[0]!r}")


def sample_lights(
    lights, p: V3, n: V3, pick_u, u1, u2
) -> Tuple[V3, jnp.ndarray, V3, jnp.ndarray]:
    """Pick one light uniformly and sample it (compute-all-select — the
    light count is a static handful, and selects keep the jnp oracle and
    the Pallas kernel bitwise-identical).

    Returns ``(omega, t_point, contrib V3, add)``. ``contrib`` is the
    MIS-weighted direct term ``emit * cos / (pi*q + cos)`` where
    ``q = pdf/N`` is the light technique's density and ``cos/pi`` the
    cosine-lobe BSDF pdf of the same direction (balance heuristic, the
    weight and the 1/q estimator factor collapsed into one denominator) —
    multiply by ``throughput * albedo``, mask by ``add`` and the shadow
    test for the direct contribution at a Lambertian hit with normal
    ``n``. The contribution is bounded by ``emit`` per channel, which is
    what kills the near-light/grazing fireflies of unweighted NEE.
    """
    nl = len(lights)
    pick = jnp.minimum(
        (pick_u * float(nl)).astype(jnp.int32), jnp.int32(nl - 1)
    )
    zero = jnp.zeros_like(u1)
    omega = V3(zero, zero, zero + 1.0)
    t_point = zero
    contrib = V3(zero, zero, zero)
    add = zero > 1.0  # all-False
    for i, light in enumerate(lights):
        o_i, t_i, pdf_i, ok_i, emit = _sample_one(light, p, u1, u2)
        cos_i = o_i.dot(n)
        piq = pdf_i * jnp.float32(math.pi / nl)
        w_scale = cos_i / jnp.maximum(piq + cos_i, 1e-12)
        sel = pick == jnp.int32(i)
        omega = V3.where(sel, o_i, omega)
        t_point = jnp.where(sel, t_i, t_point)
        contrib = V3.where(
            sel,
            V3(emit[0] * w_scale, emit[1] * w_scale, emit[2] * w_scale),
            contrib,
        )
        # cos <= 0 is a zero-integrand sample (NEE still covers the
        # light in expectation); ok_i False is structural (density 0 —
        # the BSDF pickup weight is 1 there, so nothing is lost).
        add = add | (sel & ok_i & (cos_i > 0.0))
    # Masked-off lanes must still carry finite values (their omega feeds
    # the shadow sweep's gates before the mask applies).
    omega = V3.where(add, omega, V3(zero, zero, zero + 1.0))
    t_point = jnp.where(add, t_point, 1.0)
    contrib = V3.where(add, contrib, V3(zero, zero, zero))
    return omega, t_point, contrib, add


def light_pdf_at_hit(lights, o: V3, d: V3, t_hit) -> jnp.ndarray:
    """``pi * q`` of the BSDF direction that hit a light (MIS pickup side).

    ``q`` is the density (solid-angle measure, including the 1/N pick
    probability) with which :func:`sample_lights` from origin ``o`` would
    generate the ray ``(o, d)`` reaching the light surface at ``t_hit``.
    The light is identified by re-intersecting each static light
    analytically and matching the hit distance; the structural thresholds
    mirror ``_sample_one``'s ``ok`` masks exactly, so the density is 0
    precisely where the sampler cannot generate the path (pickup weight
    1 there — the no-energy-loss contract).

    The pickup MIS weight is ``cos_prev / (cos_prev + light_pdf_at_hit)``
    with ``cos_prev`` the carried cosine of the diffuse scatter
    (``p_B = cos/pi``; both sides are scaled by pi).
    """
    nl = len(lights)
    zero = jnp.zeros_like(t_hit)
    piq = zero
    tol = jnp.float32(PICKUP_T_TOL)
    for light in lights:
        kind = light[0]
        if kind == "sphere":
            _, (cx, cy, cz), r, _emit = light
            lv = V3(cx - o.x, cy - o.y, cz - o.z)
            d2c = lv.length_sq()
            b = lv.dot(d)
            disc = b * b - (d2c - r * r)
            near = b - jnp.sqrt(jnp.maximum(disc, 0.0))
            outside = d2c > (r * r) * (1.0 + 1e-6)
            cos_max = jnp.sqrt(
                jnp.maximum(0.0, 1.0 - (r * r) / jnp.maximum(d2c, 1e-12))
            )
            solid = (2.0 * math.pi) * (1.0 - cos_max)
            match = (
                (disc > 0.0) & (near > 0.0)
                & (jnp.abs(near - t_hit) <= tol * jnp.maximum(t_hit, 1e-3))
            )
            ok = outside & (solid > 1e-9) & match
            piq_i = jnp.float32(math.pi / nl) / jnp.maximum(solid, 1e-12)
            piq = jnp.where(ok, piq_i, piq)
        elif kind == "tri":
            _, v0, e1, e2, _emit = light
            # Möller-Trumbore against the static triangle.
            px = d.y * e2[2] - d.z * e2[1]
            py = d.z * e2[0] - d.x * e2[2]
            pz = d.x * e2[1] - d.y * e2[0]
            det = e1[0] * px + e1[1] * py + e1[2] * pz
            inv = 1.0 / jnp.where(
                jnp.abs(det) < 1e-12, jnp.float32(1e-12), det
            )
            tx = o.x - v0[0]
            ty = o.y - v0[1]
            tz = o.z - v0[2]
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1[2] - tz * e1[1]
            qy = tz * e1[0] - tx * e1[2]
            qz = tx * e1[1] - ty * e1[0]
            v = (d.x * qx + d.y * qy + d.z * qz) * inv
            t_i = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv
            (nux, nuy, nuz), _, area = _tri_consts(v0, e1, e2)
            cos_l = jnp.abs(d.x * nux + d.y * nuy + d.z * nuz)
            match = (
                (jnp.abs(det) >= 1e-12)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t_i > 0.0)
                & (jnp.abs(t_i - t_hit) <= tol * jnp.maximum(t_hit, 1e-3))
            )
            # Mirror _sample_one's structural mask (d2 there is the
            # sampled-point distance; here the hit distance).
            ok = match & (cos_l > 1e-4) & (t_hit * t_hit > 1e-9)
            piq_i = (t_hit * t_hit) * (
                jnp.float32(math.pi / nl) / jnp.maximum(cos_l * area, 1e-12)
            )
            piq = jnp.where(ok, piq_i, piq)
        else:
            raise ValueError(f"unknown light kind {kind!r}")
    return piq
