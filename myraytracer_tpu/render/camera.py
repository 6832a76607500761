"""Camera ray generation, vectorized over the pixel/sample lane axis.

Two modes:

* **Reference mode** reproduces the reference's fixed pinhole exactly
  (``shader.wgsl:360-361,373-381``): camera at the origin looking down -Z,
  focal length 1, viewport height 2 (``pixel_side = 2 / H``). Two quirks
  are preserved deliberately:

  - image-space y: the fragment mapping (``shader.wgsl:23-29``) puts image
    row 0 at viewport y = -1, so the rendered image is vertically flipped
    relative to RTiOW's convention (the reference's framebuffer and present
    pass share the convention, so it is self-consistent);
  - the sub-pixel jitter window: ``viewport_base`` is computed at the pixel
    *center* and the jitter ``u ∈ [0,1) * pixel_side`` is added on top
    (``shader.wgsl:374,379-380``), so samples cover ``[px+0.5, px+1.5)`` —
    a half-pixel shift. We replicate it for parity.

* **General mode** is the positionable thin-lens camera of RTiOW ch. 12-13
  (extension; the reference has none): lookfrom/lookat/vup/vfov basis,
  focus-plane viewport, aperture disk sampling for defocus blur. Image row
  0 is the *top* (RTiOW orientation).

All functions are pure elementwise jnp over arbitrary lane shapes and run
unchanged inside Pallas kernels.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.scene.api import Camera


def reference_rays(
    width: int,
    height: int,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    lens_u1: jnp.ndarray,
    lens_u2: jnp.ndarray,
) -> Tuple[V3, V3]:
    """Reference pinhole mapping (shader.wgsl:373-381). Lens draws unused."""
    del lens_u1, lens_u2
    pixel_side = 2.0 / float(height)
    # pixel center (+0.5) plus jitter in [0,1): the reference's shifted window.
    vx = (ix.astype(jnp.float32) + 0.5 + u1 - 0.5 * width) * pixel_side
    vy = (iy.astype(jnp.float32) + 0.5 + u2 - 0.5 * height) * pixel_side
    origin = V3(
        jnp.zeros_like(vx), jnp.zeros_like(vx), jnp.zeros_like(vx)
    )
    direction = V3(vx, vy, jnp.full_like(vx, -1.0)).normalize()
    return origin, direction


class GeneralCameraParams:
    """Host-precomputed thin-lens basis (static floats, closure-captured)."""

    def __init__(self, cam: Camera, width: int, height: int):
        aspect = width / height
        theta = math.radians(cam.vfov_degrees)
        h = math.tan(theta / 2.0)
        viewport_h = 2.0 * h
        viewport_w = aspect * viewport_h
        focus = cam.resolved_focus_dist()

        lf = cam.lookfrom
        la = cam.lookat
        w = _norm3((lf[0] - la[0], lf[1] - la[1], lf[2] - la[2]))
        cu = _cross3(cam.vup, w)
        if cu[0] ** 2 + cu[1] ** 2 + cu[2] ** 2 < 1e-12:
            # A straight-up/down view with the default vup would otherwise
            # die in _norm3 with a bare ZeroDivisionError.
            raise ValueError(
                f"camera vup {cam.vup} is (nearly) parallel to the view "
                f"direction {w}; choose a non-parallel vup"
            )
        u = _norm3(cu)
        v = _cross3(w, u)

        self.origin = lf
        self.u = u
        self.v = v
        self.horizontal = tuple(focus * viewport_w * c for c in u)
        self.vertical = tuple(focus * viewport_h * c for c in v)
        self.lower_left = tuple(
            lf[i] - self.horizontal[i] / 2 - self.vertical[i] / 2 - focus * w[i]
            for i in range(3)
        )
        self.lens_radius = cam.aperture / 2.0


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _norm3(a):
    n = math.sqrt(a[0] ** 2 + a[1] ** 2 + a[2] ** 2)
    return (a[0] / n, a[1] / n, a[2] / n)


def general_rays(
    params: GeneralCameraParams,
    width: int,
    height: int,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    lens_u1: jnp.ndarray,
    lens_u2: jnp.ndarray,
) -> Tuple[V3, V3]:
    """Thin-lens rays; image row 0 = top of frame (RTiOW orientation)."""
    s = (ix.astype(jnp.float32) + u1) * (1.0 / width)
    t = 1.0 - (iy.astype(jnp.float32) + u2) * (1.0 / height)

    dx, dy = crng.unit_disk_from_uniforms(lens_u1, lens_u2)
    rdx = params.lens_radius * dx
    rdy = params.lens_radius * dy
    offset = V3(
        params.u[0] * rdx + params.v[0] * rdy,
        params.u[1] * rdx + params.v[1] * rdy,
        params.u[2] * rdx + params.v[2] * rdy,
    )
    origin = V3(
        offset.x + params.origin[0],
        offset.y + params.origin[1],
        offset.z + params.origin[2],
    )
    direction = V3(
        params.lower_left[0] + s * params.horizontal[0] + t * params.vertical[0]
        - origin.x,
        params.lower_left[1] + s * params.horizontal[1] + t * params.vertical[1]
        - origin.y,
        params.lower_left[2] + s * params.horizontal[2] + t * params.vertical[2]
        - origin.z,
    ).normalize()
    return origin, direction


def make_ray_generator(cam: Camera, width: int, height: int):
    """Return ``gen(ix, iy, u1, u2, l1, l2) -> (origin V3, dir V3)``."""
    if cam.reference_mode:
        return lambda ix, iy, u1, u2, l1, l2: reference_rays(
            width, height, ix, iy, u1, u2, l1, l2
        )
    params = GeneralCameraParams(cam, width, height)
    return lambda ix, iy, u1, u2, l1, l2: general_rays(
        params, width, height, ix, iy, u1, u2, l1, l2
    )


# ---------------------------------------------------------------------------
# Packed (runtime) camera: the thin-lens basis as a 19-float vector, so the
# Pallas kernel can take the camera as an SMEM operand instead of baking it
# into the compiled artifact — camera motion (orbit, interactive viewing)
# then costs zero recompiles. Values are the same f32 constants the closure
# path would embed, and ``rays_from_packed`` evaluates the identical
# expression tree, so images are bit-identical between the two modes.
# Layout: lower_left[3] horizontal[3] vertical[3] origin[3] u[3] v[3]
#         lens_radius[1]
# ---------------------------------------------------------------------------

PACKED_CAMERA_SIZE = 19


def orbit_camera(base: Camera, yaw: float, pitch: float, dist_scale: float) -> Camera:
    """Orbit ``base`` about its look-at point (interactive-viewer controls).

    ``yaw``/``pitch`` are radians relative to the base azimuth/elevation;
    ``dist_scale`` multiplies the base distance. Elevation is clamped
    short of the poles so the vup basis stays well-defined.

    An explicit ``focus_dist`` is shifted by the zoom delta so the world
    depth it focuses (e.g. the look-at subject on aperture scenes) stays
    in focus while the camera moves along the view ray; a ``None`` focus
    re-resolves to the new distance automatically.
    """
    import dataclasses

    lf, la = base.lookfrom, base.lookat
    dx, dy, dz = lf[0] - la[0], lf[1] - la[1], lf[2] - la[2]
    r = math.sqrt(dx * dx + dy * dy + dz * dz) or 1.0
    az = math.atan2(dz, dx) + yaw
    el = max(-1.45, min(1.45, math.asin(dy / r) + pitch))
    r2 = r * max(1e-3, dist_scale)
    focus = base.focus_dist
    if focus is not None:
        focus = max(1e-3, focus + (r2 - r))
    return dataclasses.replace(
        base,
        lookfrom=(
            la[0] + r2 * math.cos(el) * math.cos(az),
            la[1] + r2 * math.sin(el),
            la[2] + r2 * math.cos(el) * math.sin(az),
        ),
        focus_dist=focus,
    )


def pack_camera(cam: Camera, width: int, height: int):
    """Pack a general-mode camera into the [19] f32 runtime vector."""
    import numpy as np

    if cam.reference_mode:
        raise ValueError("reference-mode camera is fixed; nothing to pack")
    p = GeneralCameraParams(cam, width, height)
    return np.asarray(
        [*p.lower_left, *p.horizontal, *p.vertical, *p.origin,
         *p.u, *p.v, p.lens_radius],
        np.float32,
    )


def rays_from_packed(
    cam_ref,
    width: int,
    height: int,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    lens_u1: jnp.ndarray,
    lens_u2: jnp.ndarray,
) -> Tuple[V3, V3]:
    """``general_rays`` reading the basis from a packed [19] f32 ref.

    Same expression tree as ``general_rays`` (term order preserved), so a
    packed camera reproduces the closure camera bit-for-bit.
    """
    s = (ix.astype(jnp.float32) + u1) * (1.0 / width)
    t = 1.0 - (iy.astype(jnp.float32) + u2) * (1.0 / height)

    dx, dy = crng.unit_disk_from_uniforms(lens_u1, lens_u2)
    rdx = cam_ref[18] * dx
    rdy = cam_ref[18] * dy
    offset = V3(
        cam_ref[12] * rdx + cam_ref[15] * rdy,
        cam_ref[13] * rdx + cam_ref[16] * rdy,
        cam_ref[14] * rdx + cam_ref[17] * rdy,
    )
    origin = V3(
        offset.x + cam_ref[9],
        offset.y + cam_ref[10],
        offset.z + cam_ref[11],
    )
    direction = V3(
        cam_ref[0] + s * cam_ref[3] + t * cam_ref[6] - origin.x,
        cam_ref[1] + s * cam_ref[4] + t * cam_ref[7] - origin.y,
        cam_ref[2] + s * cam_ref[5] + t * cam_ref[8] - origin.z,
    ).normalize()
    return origin, direction
