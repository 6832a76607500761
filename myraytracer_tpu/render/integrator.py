"""The wavefront integrator (pure-jnp oracle path).

Re-expresses the reference's divergent per-pixel integrator — the fragment
shader ``fs_main`` + ``color_world`` (``shader.wgsl:336-358,372-386``) —
as an iterative masked loop over an SoA ray batch:

* the per-thread bounce ``for`` with early returns becomes a
  ``lax.while_loop`` carrying ``(origin, dir, throughput, radiance,
  active)`` for every lane, exiting early once *all* lanes retire;
* miss lanes add ``throughput * sky`` and retire (shader.wgsl:343-345);
* absorbed lanes retire black (shader.wgsl:349-350);
* depth exhaustion leaves the radiance untouched = black contribution
  (shader.wgsl:357);
* throughput multiplies the scatter attenuation and the next direction is
  normalized (shader.wgsl:353-354);
* the t-window is [1e-3, 1e4] (shader.wgsl:340).

Every random draw is ``threefry(key, (pixel_lane, sample*STRIDE + slot))``
so the result is independent of batching, tiling, and sharding: the
building block :func:`make_block_renderer` renders any row window of the
image for any sample-index window, and single-chip, tile-sharded and
sample-sharded compositions (parallel/sharding.py) reconstruct bitwise the
same frame.

This module is the correctness oracle; the Pallas megakernel in
``kernels/`` reproduces it (same RNG stream) with ray state held in VMEM.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.render import camera as cam_mod
from myraytracer_tpu.render.hit import closest_hit
from myraytracer_tpu.render.materials import color_sky, scatter
from myraytracer_tpu.render.textures import apply_texture
from myraytracer_tpu.scene import api
from myraytracer_tpu.scene.api import Camera
from myraytracer_tpu.scene.compile import CompiledScene


def trace(
    o: V3,
    d: V3,
    lane_id: jnp.ndarray,  # u32 pixel id per lane
    sample_id: jnp.ndarray,  # u32 global sample index per lane
    key,
    scene: CompiledScene,
    depth: int,
    t_min: float,
    t_max: float,
    sky=None,
    nee_lights=None,
    rr: int = 0,
) -> Tuple[V3, jnp.ndarray]:
    """Trace normalized rays to completion.

    Returns (radiance V3, segments u32) where ``segments`` counts traced
    ray segments per lane (shadow rays included; for Mrays/s accounting).
    ``sky`` is an optional constant background color (``World.ambient``):
    ``None`` keeps the reference gradient (shader.wgsl:331-334).
    ``nee_lights`` (a static tuple from render.lights.extract_lights)
    enables next-event estimation with MIS (render/lights.py).
    ``rr > 0`` enables Russian-roulette termination before tracing bounce
    ``rr`` and later: survival probability ``clamp(max(throughput),
    0.05, 0.95)``, survivors compensated by ``1/p`` (unbiased). The decision
    uniform rides a derived key (``crng.RR_KEY_FOLD``) over the bounce's
    draw id, so enabling RR shifts nothing in the main stream.
    """
    nee = bool(nee_lights)
    rr = int(rr)
    # Depths past MAX_DEPTH page the bounce draw slots under per-page
    # derived keys (crng.depth_page_key) — any u32 depth renders, and the
    # stream for depth <= MAX_DEPTH is bitwise the single-page legacy one
    # (the static `paged` flag keeps the common path free of page math).
    paged = depth > crng.MAX_DEPTH
    rr_key = crng.fold_key(key, crng.RR_KEY_FOLD) if rr else None
    shape = o.x.shape
    draw_base = (
        sample_id * jnp.uint32(crng.DRAWS_PER_SAMPLE) + jnp.uint32(crng.CAMERA_DRAWS)
    )
    unit_z = V3(
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.ones(shape, jnp.float32),
    )

    def cond(carry):
        i, _o, _d, _atten, _rad, alive, _segs, _pd = carry
        return (i < depth) & jnp.any(alive)

    def body(carry):
        i, o, d, atten, rad, alive, segs, prev_cos = carry
        segs = segs + alive.astype(jnp.uint32)

        hit = closest_hit(o, d, scene, t_min, t_max)
        # Procedural/bitmap albedo at the hit point (no-op on untextured
        # scenes); every consumer below (emission pickup, NEE, scatter)
        # then sees the effective color — render/textures.py.
        hit = apply_texture(hit, image=scene.tex_image)

        # Miss → attenuation * sky, retire (shader.wgsl:343-345).
        miss = alive & ~hit.mask
        if sky is None:
            skyv = color_sky(d.y)
        else:
            zs = jnp.zeros(shape, jnp.float32)
            skyv = V3(
                zs + jnp.float32(sky[0]),
                zs + jnp.float32(sky[1]),
                zs + jnp.float32(sky[2]),
            )
        zero = V3.zeros(shape)
        rad = rad + V3.where(miss, atten * skyv, zero)
        alive = alive & hit.mask

        # Emissive hit → throughput * emission, retire (extension;
        # emission rides the albedo columns — scene/compile.py). Under
        # NEE+MIS, a lane whose last vertex was diffuse (prev_cos > 0)
        # weights pickup by the balance heuristic against the light
        # sampler's density for the direction it traced; specular chains
        # and non-NEE renders keep full pickup (render/lights.py).
        is_light = alive & (hit.mat_ty == api.MATERIAL_LIGHT)
        if nee:
            from myraytracer_tpu.render.lights import light_pdf_at_hit

            piq = light_pdf_at_hit(nee_lights, o, d, hit.t)
            w_mis = jnp.where(
                prev_cos > 0.0,
                prev_cos / jnp.maximum(prev_cos + piq, 1e-12),
                jnp.float32(1.0),
            )
            rad = rad + V3.where(is_light, atten * hit.albedo * w_mis, zero)
        else:
            rad = rad + V3.where(is_light, atten * hit.albedo, zero)
        alive = alive & ~is_light

        # Scatter draws: slot 0 = unit-sphere; slots 1-2 = unit-ball;
        # slot 2's second word = dielectric reflect draw.
        if paged:
            page = (i // jnp.int32(crng.BOUNCES_PER_PAGE)).astype(jnp.uint32)
            local = i - (page * jnp.uint32(crng.BOUNCES_PER_PAGE)).astype(
                jnp.int32
            )
            bkey = crng.depth_page_key(key, page)
            brr_key = crng.fold_key(bkey, crng.RR_KEY_FOLD) if rr else None
        else:
            local, bkey, brr_key = i, key, rr_key
        draw = draw_base + local.astype(jnp.uint32) * jnp.uint32(
            crng.DRAWS_PER_BOUNCE
        )
        us1, us2 = crng.uniform2(bkey, lane_id, draw)
        ub1, ub2 = crng.uniform2(bkey, lane_id, draw + jnp.uint32(1))
        ub3, ud = crng.uniform2(bkey, lane_id, draw + jnp.uint32(2))
        sphere_sample = crng.unit_sphere_from_uniforms(us1, us2)
        ball_sample = crng.unit_ball_from_uniforms(ub1, ub2, ub3)

        is_lamb_hit = alive & (hit.mat_ty == api.MATERIAL_LAMBERTIAN)
        if nee:
            from myraytracer_tpu.render.lights import (
                SHADOW_EPS, sample_lights,
            )

            n1, n2 = crng.uniform2(bkey, lane_id, draw + jnp.uint32(3))
            omega, t_p, contrib, ok_s = sample_lights(
                nee_lights, hit.point, hit.normal, ud, n1, n2
            )
            shadow = closest_hit(hit.point, omega, scene, t_min, t_max)
            lit = ~(shadow.mask & (shadow.t < t_p * (1.0 - SHADOW_EPS)))
            add = is_lamb_hit & ok_s & lit
            rad = rad + V3.where(add, atten * hit.albedo * contrib, zero)
            segs = segs + is_lamb_hit.astype(jnp.uint32)  # shadow rays
        sc = scatter(d, hit, sphere_sample, ball_sample, ud)
        alive = alive & sc.ok  # absorbed → retire black (shader.wgsl:349-350)

        atten = V3.where(alive, atten * sc.attenuation, atten)
        o = V3.where(alive, hit.point, o)
        # Normalize next direction (shader.wgsl:354); freeze dead lanes to a
        # safe unit vector so no NaN is ever materialized.
        nd = V3.where(alive, sc.direction, unit_z).normalize()
        d = V3.where(alive, nd, d)
        if nee:
            # Cosine of the diffuse scatter (the lobe's pdf is cos/pi):
            # the MIS pickup weight's BSDF side at the NEXT hit. Zero for
            # specular scatters (full-weight pickup).
            prev_cos = jnp.where(
                alive & is_lamb_hit,
                jnp.maximum(d.dot(hit.normal), 0.0),
                jnp.float32(0.0),
            )
        if rr:
            # Russian roulette before tracing bounce i+1 (>= rr): kill
            # with probability 1-p, divide survivors' throughput by p.
            do_rr = alive & (i + 1 >= jnp.int32(rr))
            u, _ = crng.uniform2(brr_key, lane_id, draw)
            p = jnp.clip(
                jnp.maximum(atten.x, jnp.maximum(atten.y, atten.z)),
                0.05, 0.95,
            )
            alive = alive & ~(do_rr & (u >= p))
            atten = V3.where(do_rr & alive, atten * (1.0 / p), atten)
        return (i + 1, o, d, atten, rad, alive, segs, prev_cos)

    init = (
        jnp.int32(0),
        o,
        d,
        V3.ones(shape),
        V3.zeros(shape),
        jnp.ones(shape, bool),
        jnp.zeros(shape, jnp.uint32),
        jnp.zeros(shape, jnp.float32),  # prev_cos (MIS pickup weight)
    )
    _, _, _, _, rad, _, segs, _ = jax.lax.while_loop(cond, body, init)
    return rad, segs


def render_sample_batch(
    scene: CompiledScene,
    ray_gen,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    lane_id: jnp.ndarray,
    sample_id: jnp.ndarray,
    key,
    depth: int,
    t_min: float,
    t_max: float,
    sky=None,
    lens_draws: bool = True,
    nee_lights=None,
    qmc: bool = False,
    rr: int = 0,
) -> Tuple[V3, jnp.ndarray]:
    """Camera-generate and trace one batch of (pixel, sample) lanes."""
    # Camera draw slots: 0 = sub-pixel jitter, 1 = lens disk. Draws are
    # keyed by ABSOLUTE slot, so skipping slot 1 for cameras that ignore
    # it (reference mode) shifts nothing else in the stream. Under QMC
    # both camera pairs come from the scrambled Sobol sequence instead
    # (core/rng.py) and the slot 0/1 draws are skipped entirely.
    if qmc:
        u1, u2 = crng.qmc_camera_uniforms(key, lane_id, sample_id, 0)
        if lens_draws:
            l1, l2 = crng.qmc_camera_uniforms(key, lane_id, sample_id, 1)
        else:
            l1 = l2 = jnp.zeros_like(u1)
    else:
        cam_draw = sample_id * jnp.uint32(crng.DRAWS_PER_SAMPLE)
        u1, u2 = crng.uniform2(key, lane_id, cam_draw)
        if lens_draws:
            l1, l2 = crng.uniform2(key, lane_id, cam_draw + jnp.uint32(1))
        else:
            l1 = l2 = jnp.zeros_like(u1)
    o, d = ray_gen(ix, iy, u1, u2, l1, l2)
    return trace(
        o, d, lane_id, sample_id, key, scene, depth, t_min, t_max, sky=sky,
        nee_lights=nee_lights, rr=rr,
    )


def make_block_renderer(
    cam: Camera,
    width: int,
    height: int,
    n_rows: int,
    max_samples: int,
    ray_depth: int,
    t_min: float = 1e-3,
    t_max: float = 1e4,
    sample_batch: int = 1,
    material_set=None,
    static_ior=None,
    sky=None,
    nee_lights=None,
    texture_set=None,
    qmc: bool = False,
    rr: int = 0,
):
    """Build the composable rendering primitive.

    Returns ``block(scene, key, row0, sample_start, n_valid) ->
    (radiance_sum [n_rows, width, 3] f32, segments f32 scalar)``:

    the SUM of radiance over sample indices ``[sample_start,
    sample_start + n_valid)`` (``n_valid`` may be traced; at most the
    static ``max_samples``) for image rows ``[row0, row0 + n_rows)``.
    Out-of-range samples are traced but masked to weight 0, so shapes are
    static under sharding. The caller divides by the global sample count.
    """
    del material_set, static_ior, texture_set  # the oracle keeps all
    # branches and reads texture rows straight off the compiled scene
    # (these are Pallas-kernel specialization knobs)
    b = max(1, min(int(sample_batch), int(max_samples)))
    n_batches = -(-int(max_samples) // b)
    static_gen = cam_mod.make_ray_generator(cam, width, height)
    n_pixels = n_rows * width

    def block(scene: CompiledScene, key, row0, sample_start, n_valid):
        # A packed runtime camera (scene.cam) overrides the construction
        # camera — same contract as the Pallas kernel (general mode only;
        # the reference camera is fixed by definition).
        if scene.cam is not None and not cam.reference_mode:
            ray_gen = lambda ix, iy, u1, u2, l1, l2: (  # noqa: E731
                cam_mod.rays_from_packed(
                    scene.cam, width, height, ix, iy, u1, u2, l1, l2
                )
            )
        else:
            ray_gen = static_gen
        row0 = jnp.asarray(row0, jnp.uint32)
        sample_start = jnp.asarray(sample_start, jnp.uint32)
        n_valid = jnp.asarray(n_valid, jnp.uint32)

        pix_local = jnp.arange(n_pixels, dtype=jnp.uint32)
        ix = (pix_local % jnp.uint32(width)).astype(jnp.int32)
        iy_local = pix_local // jnp.uint32(width)
        iy = (iy_local + row0).astype(jnp.int32)
        lane_id = iy.astype(jnp.uint32) * jnp.uint32(width) + ix.astype(jnp.uint32)

        ix_b = jnp.broadcast_to(ix, (b, n_pixels))
        iy_b = jnp.broadcast_to(iy, (b, n_pixels))
        lane_b = jnp.broadcast_to(lane_id, (b, n_pixels))
        row = jnp.arange(b, dtype=jnp.uint32)[:, None]  # [b, 1]

        def batch(carry, j):
            acc, segs_total = carry
            local_idx = j * jnp.uint32(b) + row  # [b, 1]
            sample_id = jnp.broadcast_to(sample_start + local_idx, (b, n_pixels))
            in_range = local_idx < n_valid  # [b, 1]
            rad, segs = render_sample_batch(
                scene, ray_gen, ix_b, iy_b, lane_b, sample_id,
                key, ray_depth, t_min, t_max, sky=sky,
                lens_draws=not cam.reference_mode,
                nee_lights=nee_lights, qmc=qmc, rr=rr,
            )
            w = in_range.astype(jnp.float32)
            acc = acc + V3(
                jnp.sum(rad.x * w, axis=0),
                jnp.sum(rad.y * w, axis=0),
                jnp.sum(rad.z * w, axis=0),
            )
            # f32 accumulation: frame totals can exceed uint32 range and a
            # ~1e-7 relative error is irrelevant for throughput accounting.
            segs_total = segs_total + jnp.sum(segs.astype(jnp.float32) * w)
            return (acc, segs_total), None

        acc0 = V3.zeros((n_pixels,))
        segs0 = jnp.float32(0.0)
        if n_batches == 1:
            (acc, segs_total), _ = batch((acc0, segs0), jnp.uint32(0))
        else:
            (acc, segs_total), _ = jax.lax.scan(
                batch, (acc0, segs0), jnp.arange(n_batches, dtype=jnp.uint32)
            )

        img_sum = jnp.stack([acc.x, acc.y, acc.z], axis=-1).reshape(n_rows, width, 3)
        return img_sum, segs_total

    return block


def make_renderer(
    cam: Camera,
    width: int,
    height: int,
    samples_per_frame: int,
    ray_depth: int,
    t_min: float = 1e-3,
    t_max: float = 1e4,
    sample_batch: int = 1,
    material_set=None,
    static_ior=None,
    frames: int = 1,
    sky=None,
    nee_lights=None,
    texture_set=None,
    qmc: bool = False,
    rr: int = 0,
):
    """Build a jitted single-device frame renderer.

    Returns ``render(scene, key, sample_base) -> (image [H,W,3] f32,
    segments f32 scalar)`` — the mean radiance over ``samples_per_frame``
    samples starting at global sample index ``sample_base``. This is the
    analog of one ``State::redraw`` trace pass (``lib.rs:241-307``) without
    the accumulation blend (which belongs to the session, as in the
    reference).

    ``frames=K > 1`` returns K per-frame mean images ``[K, 3, H, W]``
    (channels-first — a trailing 3 would pad to 128 under TPU tiling)
    from one jit call (a scan of per-frame blocks — bitwise identical to
    K separate calls; same contract as the Pallas multi-frame renderer,
    where it amortizes the in-kernel regeneration tail).
    """
    spp = int(samples_per_frame)
    frames = int(frames)
    block = make_block_renderer(
        cam, width, height, height, spp, ray_depth,
        t_min=t_min, t_max=t_max, sample_batch=sample_batch,
        material_set=material_set, static_ior=static_ior, sky=sky,
        nee_lights=nee_lights, texture_set=texture_set, qmc=qmc, rr=rr,
    )

    if frames > 1:

        @jax.jit
        def render_multi(scene: CompiledScene, key, sample_base):
            base = jnp.asarray(sample_base, jnp.uint32)

            def one(segs_total, f):
                img_sum, segs = block(
                    scene, key, jnp.uint32(0),
                    base + f * jnp.uint32(spp), jnp.uint32(spp),
                )
                img = img_sum * jnp.float32(1.0 / spp)
                return segs_total + segs, jnp.transpose(img, (2, 0, 1))

            segs_total, imgs = jax.lax.scan(
                one, jnp.float32(0.0), jnp.arange(frames, dtype=jnp.uint32)
            )
            return imgs, segs_total

        return render_multi

    @jax.jit
    def render(scene: CompiledScene, key, sample_base):
        img_sum, segs = block(
            scene, key, jnp.uint32(0), jnp.asarray(sample_base, jnp.uint32),
            jnp.uint32(spp),
        )
        return img_sum * jnp.float32(1.0 / spp), segs

    return render
