"""Masked material scatter.

The reference dispatches on a runtime material-type id per thread
(``shader.wgsl:244-252``). On TPU every lane computes all material branches
and selects by type (compute-all-select — cheap for 3 material families,
SURVEY.md §7.2 "material dispatch").

Behavioral contracts preserved:

* **Lambertian** (shader.wgsl:203-216): ``dir = normal + unit_sphere``;
  exact-zero degenerate direction falls back to the normal; attenuation is
  the albedo; always scatters.
* **Metal** (shader.wgsl:228-242): ``dir = reflect(in, n) + fuzz * ball``;
  the ray is *absorbed* (path goes black) when ``dot(dir, normal) <= 0``.
  Note the test uses the un-normalized scatter direction, and the incoming
  direction is the normalized ray.
* **Dielectric** (extension; RTiOW ch. 10 semantics): Schlick reflectance,
  total internal reflection, refraction ratio 1/ior on front faces;
  attenuation 1; always scatters.
* **DiffuseLight** (extension; RTiOW book 2 ch. 7): never scatters — it
  falls through this dispatch with ``ok=False`` (the same path as the
  reference's unknown-type fall-through), and the bounce loop adds
  ``throughput * emission`` before retiring the lane (emission rides the
  albedo columns; render/integrator.py, kernels/trace.py).

Scatter directions are returned un-normalized; the bounce loop normalizes
(matching ``shader.wgsl:354``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from myraytracer_tpu.core.vec import V3, lerp, reflect
from myraytracer_tpu.render.hit import Hit
from myraytracer_tpu.scene import api


class Scatter(NamedTuple):
    ok: jnp.ndarray  # bool: False = absorbed (black path)
    direction: V3  # un-normalized next direction
    attenuation: V3


ALL_MATERIALS = (
    api.MATERIAL_LAMBERTIAN,
    api.MATERIAL_METAL,
    api.MATERIAL_DIELECTRIC,
)


def scatter(
    d: V3,
    hit: Hit,
    sphere_sample: V3,
    ball_sample: V3,
    u_reflect: jnp.ndarray,
    material_set=None,
) -> Scatter:
    """Compute-all-select scatter for normalized incoming direction ``d``.

    ``sphere_sample``/``ball_sample`` are pre-drawn unit-sphere / unit-ball
    vectors; ``u_reflect`` a pre-drawn U[0,1) for the dielectric branch.

    ``material_set`` statically restricts which material families the scene
    contains (type ids); branches for absent families are not emitted —
    a cheap specialization for the hot Pallas path. Omitting a family never
    changes the RNG draw-slot layout, so specialization keeps the sample
    stream identical.
    """
    ms = frozenset(material_set) if material_set is not None else frozenset(ALL_MATERIALS)
    n = hit.normal
    ty = hit.mat_ty

    direction = n  # placeholder for lanes with no material branch
    ok = jnp.zeros(ty.shape, bool)

    if api.MATERIAL_DIELECTRIC in ms:
        # Dielectric (RTiOW ch. 10)
        ratio = jnp.where(hit.front_face, 1.0 / hit.ior, hit.ior)
        cos_theta = jnp.minimum(-d.dot(n), 1.0)
        sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
        cannot_refract = ratio * sin_theta > 1.0
        r0 = (1.0 - ratio) / (1.0 + ratio)
        r0 = r0 * r0
        reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
        do_reflect = cannot_refract | (reflectance > u_reflect)
        refr_perp = (d + n * cos_theta) * ratio
        refr_par = n * (-jnp.sqrt(jnp.abs(1.0 - refr_perp.length_sq())))
        refr_dir = refr_perp + refr_par
        diel_dir = V3.where(do_reflect, reflect(d, n), refr_dir)
        is_diel = ty == api.MATERIAL_DIELECTRIC
        direction = V3.where(is_diel, diel_dir, direction)
        ok = ok | is_diel

    if api.MATERIAL_METAL in ms:
        # Metal (shader.wgsl:228-242)
        metal_dir = reflect(d, n) + ball_sample * hit.fuzz
        metal_ok = metal_dir.dot(n) > 0.0
        is_metal = ty == api.MATERIAL_METAL
        direction = V3.where(is_metal, metal_dir, direction)
        # Boolean algebra, not a bool-valued select: Mosaic cannot lower
        # selects that *produce* i1 vectors.
        ok = ok | (is_metal & metal_ok)

    if api.MATERIAL_LAMBERTIAN in ms:
        # Lambertian (shader.wgsl:203-216)
        lamb_dir = n + sphere_sample
        degenerate = lamb_dir.length_sq() == 0.0
        lamb_dir = V3.where(degenerate, n, lamb_dir)
        is_lamb = ty == api.MATERIAL_LAMBERTIAN
        direction = V3.where(is_lamb, lamb_dir, direction)
        ok = ok | is_lamb

    # Unknown/pad material type: absorbed, like the reference's dispatch
    # fall-through (shader.wgsl:249-251).
    if api.MATERIAL_DIELECTRIC in ms:
        white = V3.ones(ty.shape)
        attenuation = V3.where(ty == api.MATERIAL_DIELECTRIC, white, hit.albedo)
    else:
        attenuation = hit.albedo
    return Scatter(ok=ok, direction=direction, attenuation=attenuation)


def color_sky(y_normalized: jnp.ndarray) -> V3:
    """Sky gradient (shader.wgsl:331-334): mix(white, blue, 0.5*y + 0.5)."""
    t = 0.5 * y_normalized + 0.5
    return lerp(V3(1.0, 1.0, 1.0), V3(0.5, 0.7, 1.0), t)
