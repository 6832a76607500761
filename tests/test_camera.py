"""Camera ray-generation contracts."""

import math

import jax.numpy as jnp
import numpy as np

from myraytracer_tpu.render.camera import make_ray_generator, reference_rays
from myraytracer_tpu.scene.api import Camera


def f(v):
    return jnp.full((1,), v, jnp.float32)


def zero():
    return f(0.0)


def test_reference_mapping_exact():
    """shader.wgsl:373-381: viewport = (px+0.5+u - 0.5*shape) * 2/H."""
    W, H = 4, 2
    o, d = reference_rays(W, H, f(0), f(0), zero(), zero(), zero(), zero())
    # vx = (0.5 - 2) * 1 = -1.5; vy = (0.5 - 1) * 1 = -0.5; dir=(vx,vy,-1)/n
    want = np.array([-1.5, -0.5, -1.0])
    want = want / np.linalg.norm(want)
    got = np.array([float(d.x[0]), float(d.y[0]), float(d.z[0])])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert float(o.x[0]) == 0.0 and float(o.z[0]) == 0.0


def test_reference_jitter_window_is_shifted():
    """Jitter u ∈ [0,1) is added on top of the pixel-center base
    (shader.wgsl:374,379): u=0.99 nearly reaches the next pixel center + .5."""
    W, H = 4, 4
    _, d0 = reference_rays(W, H, f(1), f(1), zero(), zero(), zero(), zero())
    _, d1 = reference_rays(W, H, f(1), f(1), f(0.999), zero(), zero(), zero())
    # moving u from 0→1 moves vx by one pixel_side = 2/H = 0.5
    vx0 = float(d0.x[0]) / abs(float(d0.z[0]))  # un-normalized slope x
    vx1 = float(d1.x[0]) / abs(float(d1.z[0]))
    np.testing.assert_allclose(vx1 - vx0, 0.4995, rtol=1e-3)


def test_reference_y_orientation():
    """Row 0 (top) has viewport y ≈ -1 (the reference's flipped frame)."""
    W, H = 8, 8
    _, d_top = reference_rays(W, H, f(4), f(0), zero(), zero(), zero(), zero())
    _, d_bot = reference_rays(W, H, f(4), f(7), zero(), zero(), zero(), zero())
    assert float(d_top.y[0]) < 0 < float(d_bot.y[0])


def test_general_camera_center_ray():
    cam = Camera(
        lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov_degrees=90.0, aperture=0.0
    )
    gen = make_ray_generator(cam, 100, 50)
    # Exact center of the image: ix+u = 50 → s = 0.5, iy+v = 25 → t = 0.5.
    o, d = gen(f(49), f(24), f(1.0), f(1.0), zero(), zero())
    np.testing.assert_allclose(
        [float(d.x[0]), float(d.y[0]), float(d.z[0])], [0, 0, -1], atol=1e-6
    )
    assert float(o.x[0]) == 0.0


def test_general_camera_top_row_points_up():
    """General camera uses RTiOW orientation: row 0 = top = +y side."""
    cam = Camera(lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov_degrees=90.0)
    gen = make_ray_generator(cam, 10, 10)
    _, d_top = gen(f(5), f(0), f(0.5), f(0.5), zero(), zero())
    _, d_bot = gen(f(5), f(9), f(0.5), f(0.5), zero(), zero())
    assert float(d_top.y[0]) > 0 > float(d_bot.y[0])


def test_general_camera_fov():
    """vfov 90 at focus 1: the viewport spans y ∈ [-1, 1]."""
    cam = Camera(
        lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov_degrees=90.0, focus_dist=1.0
    )
    gen = make_ray_generator(cam, 10, 10)
    _, d = gen(f(5), f(0), f(0.5), f(0.0), zero(), zero())  # very top edge
    slope = float(d.y[0]) / abs(float(d.z[0]))
    np.testing.assert_allclose(slope, 1.0, rtol=1e-5)


def test_defocus_origin_on_lens_disk():
    cam = Camera(
        lookfrom=(0, 0, 0),
        lookat=(0, 0, -1),
        vfov_degrees=90.0,
        aperture=2.0,
        focus_dist=1.0,
    )
    gen = make_ray_generator(cam, 10, 10)
    o, d = gen(f(5), f(5), f(0.5), f(0.5), f(0.9), f(0.3))
    r = math.hypot(float(o.x[0]), float(o.y[0]))
    assert 0 < r <= 1.0  # within lens radius = aperture/2
    # Jittered pixel (5.5, 5.5) of 10x10 → s=0.55, t=0.45; at 90° vfov and
    # focus 1 the focus plane point is ((s-.5)*2, (t-.5)*2, -1). All lens
    # origins' rays must pass through it: origin + t*d at z=-1.
    tz = -1.0 / float(d.z[0])
    fx = float(o.x[0]) + tz * float(d.x[0])
    fy = float(o.y[0]) + tz * float(d.y[0])
    np.testing.assert_allclose([fx, fy], [0.1, -0.1], atol=1e-5)


def test_aperture_zero_is_pinhole():
    cam = Camera(lookfrom=(3, 3, 2), lookat=(0, 0, -1), vfov_degrees=20.0)
    gen = make_ray_generator(cam, 10, 10)
    o, _ = gen(f(2), f(7), f(0.1), f(0.7), f(0.8), f(0.8))
    np.testing.assert_allclose(
        [float(o.x[0]), float(o.y[0]), float(o.z[0])], [3, 3, 2], atol=1e-6
    )


def test_orbit_zoom_keeps_subject_in_focus():
    """Wheel zoom (dist_scale) shifts an explicit focus_dist by the zoom
    delta, so the focused world depth (e.g. the look-at subject) stays in
    focus; None focus re-resolves automatically."""
    from myraytracer_tpu.render.camera import orbit_camera

    base = Camera(
        lookfrom=(3.0, 0.0, 0.0), lookat=(0.0, 0.0, 0.0),
        aperture=0.5, focus_dist=3.0,
    )
    zoomed = orbit_camera(base, 0.0, 0.0, 2.0)
    np.testing.assert_allclose(zoomed.resolved_focus_dist(), 6.0, atol=1e-6)
    # yaw-only orbit: distance unchanged → focus unchanged
    turned = orbit_camera(base, 0.7, 0.0, 1.0)
    np.testing.assert_allclose(turned.resolved_focus_dist(), 3.0, atol=1e-6)
    # focus anchored off the subject keeps its world depth under zoom
    import dataclasses

    near = orbit_camera(dataclasses.replace(base, focus_dist=2.0),
                        0.0, 0.0, 2.0)
    np.testing.assert_allclose(near.resolved_focus_dist(), 5.0, atol=1e-6)
    auto = orbit_camera(
        Camera(lookfrom=(3.0, 0.0, 0.0), lookat=(0.0, 0.0, 0.0)), 0.0, 0.0, 2.0
    )
    np.testing.assert_allclose(auto.resolved_focus_dist(), 6.0, atol=1e-6)


def test_vup_parallel_to_view_is_loud():
    import pytest

    from myraytracer_tpu.render.camera import GeneralCameraParams
    from myraytracer_tpu.scene.api import Camera

    cam = Camera(lookfrom=(0.0, 5.0, 0.0), lookat=(0.0, 0.0, 0.0),
                 vup=(0.0, 1.0, 0.0))
    with pytest.raises(ValueError, match="vup"):
        GeneralCameraParams(cam, 16, 8)
