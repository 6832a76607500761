"""Procedural texture evaluation (extension; no reference counterpart).

The reference's materials carry constant colors only (``api::Lambertian``
etc., ``raytracer/src/lib.rs:611-639``). This module adds RTiOW book-2
style textures — checker and marble — as *procedural albedo*: the winner
primitive's record carries a texture type, a second color, and a scale
(scene/compile.py packs them), and the bounce loop replaces the hit's
albedo with the texture value at the hit point before scatter/emission
use it.

TPU-first design:

* texture evaluation happens ONCE per bounce on the closest-hit winner
  (never inside the per-primitive hit sweep), so even the 7-octave noise
  costs a small fraction of the sweep;
* all branches are compute-all-select over the lane batch, statically
  pruned by ``texture_set`` — an untextured scene compiles to exactly the
  code it had before this module existed;
* evaluation is exact arithmetic (integer-hash noise, triangle-wave
  bands — core/noise.py), so the Pallas kernel and the jnp oracle remain
  bitwise identical, and no RNG draws are consumed (the sample stream is
  untouched).

Shared by the jnp oracle (render/integrator.py via render/hit.py's
record fields) and the Pallas megakernel (kernels/trace.py decodes the
same fields from its packed scene table).
"""

from __future__ import annotations

import jax.numpy as jnp

from myraytracer_tpu.core.noise import triangle_wave, turbulence
from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.scene import api

TEX_SOLID = api.TEXTURE_SOLID
TEX_CHECKER = api.TEXTURE_CHECKER
TEX_MARBLE = api.TEXTURE_MARBLE
TEX_IMAGE = api.TEXTURE_IMAGE

ALL_TEXTURES = (TEX_CHECKER, TEX_MARBLE, TEX_IMAGE)

_PI = 3.14159265358979
_INV_PI = 1.0 / _PI
_INV_2PI = 0.5 / _PI


def sphere_uv(outward: V3):
    """RTiOW book-2 ch. 4.2 sphere mapping of an OUTWARD unit normal:
    ``u = (atan2(-z, x) + pi) / 2pi``, ``v = acos(-y) / pi``."""
    u = (jnp.arctan2(-outward.z, outward.x) + _PI) * _INV_2PI
    v = jnp.arccos(jnp.clip(-outward.y, -1.0, 1.0)) * _INV_PI
    return u, v


def image_albedo(image: jnp.ndarray, scale, outward: V3) -> V3:
    """Nearest-texel lookup of the scene bitmap at the sphere UV.

    ``image`` is the compiled scene's [TH, TW, 3] array; ``scale`` tiles
    the map (frac of u*scale / v*scale). v flips so image row 0 is the
    top, and indices clamp like the book's. This is an XLA gather over
    the lane batch — the jnp integrator's path; the Pallas megakernel
    has no per-lane VMEM gather and rejects image-textured scenes.
    """
    u, v = sphere_uv(outward)
    us = u * scale
    vs = v * scale
    us = us - jnp.floor(us)
    vs = vs - jnp.floor(vs)
    th, tw = image.shape[0], image.shape[1]
    i = jnp.clip((us * tw).astype(jnp.int32), 0, tw - 1)
    j = jnp.clip(((1.0 - vs) * th).astype(jnp.int32), 0, th - 1)
    texel = image[j, i]
    return V3(texel[..., 0], texel[..., 1], texel[..., 2])


def checker_albedo(even: V3, odd: V3, scale, p: V3) -> V3:
    """3-D checker: ``even`` where floor(p*scale) coordinates sum even.

    Floor-parity form of RTiOW book-2 ch. 4.3 (``scale`` = cells per unit
    length; the book's ``inv_scale`` is ``1/scale``). Integer parity, not
    f32 modulo, so the pattern is exact at any distance.
    """
    sx = jnp.floor(p.x * scale).astype(jnp.int32)
    sy = jnp.floor(p.y * scale).astype(jnp.int32)
    sz = jnp.floor(p.z * scale).astype(jnp.int32)
    is_even = ((sx + sy + sz) & jnp.int32(1)) == 0
    return V3.where(is_even, even, odd)


def marble_albedo(color: V3, scale, p: V3) -> jnp.ndarray:
    """Marble band factor applied to ``color`` (book-2 ch. 5.7 semantics).

    ``0.5 * (1 + band(scale * z + 10 * turbulence(p)))`` with the exact
    triangle wave standing in for ``sin`` (core/noise.py rationale).
    """
    band = triangle_wave(scale * p.z + 10.0 * turbulence(p))
    return color * (0.5 * (1.0 + band))


def effective_albedo(
    albedo: V3,
    tex_ty: jnp.ndarray,
    albedo2: V3,
    tex_scale: jnp.ndarray,
    point: V3,
    texture_set=None,
    image=None,
    outward: V3 = None,
) -> V3:
    """Compute-all-select texture dispatch (lane-batched).

    ``albedo`` doubles as the solid color, the checker EVEN color, and the
    marble base color; ``albedo2`` is the checker ODD color; ``tex_ty``
    selects per lane. ``texture_set`` statically restricts which texture
    families the scene contains — branches for absent families are not
    emitted (the ``material_set`` idiom).
    """
    ts = (
        frozenset(texture_set)
        if texture_set is not None
        else frozenset(ALL_TEXTURES)
    )
    out = albedo
    if TEX_CHECKER in ts:
        out = V3.where(
            tex_ty == TEX_CHECKER,
            checker_albedo(albedo, albedo2, tex_scale, point),
            out,
        )
    if TEX_MARBLE in ts:
        out = V3.where(
            tex_ty == TEX_MARBLE,
            marble_albedo(albedo, tex_scale, point),
            out,
        )
    if TEX_IMAGE in ts and image is not None:
        # The albedo row is a white multiplier for image lanes
        # (scene/compile._base_color), so textured metal tints still work
        # if a colored multiplier is ever compiled in.
        out = V3.where(
            tex_ty == TEX_IMAGE,
            albedo * image_albedo(image, tex_scale, outward),
            out,
        )
    return out


def apply_texture(hit, texture_set=None, image=None):
    """Replace ``hit.albedo`` with the texture value at ``hit.point``.

    No-op (returns ``hit`` unchanged) when the hit record carries no
    texture fields — i.e. the scene is untextured. ``image`` is the
    compiled scene's bitmap (``scene.tex_image``) for TEXTURE_IMAGE
    lanes; the UV comes from the OUTWARD normal (un-flipping the hit's
    front-face-oriented one), per the book's sphere mapping.
    """
    if hit.tex_ty is None:
        return hit
    outward = V3.where(hit.front_face, hit.normal, -hit.normal)
    return hit._replace(
        albedo=effective_albedo(
            hit.albedo, hit.tex_ty, hit.albedo2, hit.tex_scale, hit.point,
            texture_set, image=image, outward=outward,
        )
    )
