"""Edge-avoiding à-trous wavelet denoiser (extension; output post-process).

The reference presents the raw accumulation buffer (``shader.wgsl:383-386``
— gamma only); at low sample counts the image is visibly noisy and the
only fix is more samples. Production path tracers pair low-spp renders
with a feature-guided reconstruction filter instead. This module is that
filter, TPU-first:

* **à-trous wavelet** (Dammertz et al., "Edge-Avoiding À-Trous Wavelet
  Transform for Fast Global Illumination Filtering", HPG 2010): N
  iterations of a 5×5 B3-spline cross-bilateral kernel with tap spacing
  doubling each iteration — a 5-iteration filter has the support of an
  ~81×81 bilateral at 25 taps/pixel/iteration. Every tap is a static
  image shift + elementwise math over [H, W, 3]: pure VPU work that XLA
  fuses, no gathers, no data-dependent control flow.
* **Feature buffers** come from one deterministic primary-hit pass
  (center-of-pixel ray through the lens center, the existing
  ``closest_hit`` oracle): per-pixel albedo (texture-evaluated), shading
  normal, and hit distance. Edge-stopping weights on normal and relative
  depth keep geometry and silhouette edges sharp while smoothing noise.
* **Albedo demodulation**: the filter runs on irradiance
  (``color / max(albedo, eps)``) and remodulates afterwards, so texture
  detail (checker/marble/image) survives aggressive smoothing.

The filter is a *display/output* transform: checkpoints store the raw
accumulation state (blending semantics are untouched), and `--denoise`
changes no sample stream — the same checkpoint renders raw or denoised.

Known limit (documented, inherent to primary-hit features): under strong
defocus the aux buffers are pinhole-sharp while the image is blurry, so
edge-stopping under-smooths inside bokeh regions; and perfectly specular
reflections carry the *mirror's* features, so reflected-image noise is
smoothed only by the color weight. Both degrade toward "less denoising",
never toward extra bias across true edges.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.render import camera as cam_mod
from myraytracer_tpu.render.hit import closest_hit
from myraytracer_tpu.render.textures import apply_texture
from myraytracer_tpu.scene import api
from myraytracer_tpu.scene.compile import compile_scene

# Demodulation floor: out = filter(fb / max(albedo, EPS)) * max(albedo, EPS)
# is exactly identity-consistent for an unfiltered signal at any albedo.
ALBEDO_EPS = 0.05

# 1-D B3 spline taps; the 5x5 kernel is the outer product (Dammertz §3).
_B3 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)

# Defaults tuned on the preset scenes (tools/denoise_bench.py; BENCH.md
# "Denoising"): sigma_color is DIMENSIONLESS (the luminance distance is
# normalized by a per-pixel noise estimate, so one default serves every
# scene scale and sample count); normal is unit-vector L2², depth relative.
DEFAULT_ITERATIONS = 5
DEFAULT_SIGMA_COLOR = 4.0
DEFAULT_SIGMA_NORMAL = 0.35
DEFAULT_SIGMA_DEPTH = 0.07

# Rec.709 luma weights (the color weight runs on luminance, SVGF-style).
_LUM = (0.2126, 0.7152, 0.0722)
# 1-D 3-tap Gaussian for the local noise-moment estimate.
_G3 = (0.25, 0.5, 0.25)

# Measured raw-vs-denoised crossover (tools/denoise_bench.py; BENCH.md
# "Denoising"): past ~45-64 accumulated spp the raw estimator beats the
# filter's bias floor on the small calibration scene. 64 anchors the
# spp FALLBACK schedule below; since round 5 the primary auto schedule
# is noise-driven (noise_iterations) — the round-5 production-size
# ladders showed the spp anchor is strongly scene-dependent (final
# scene crossover ~16-32 spp with only 1 useful iteration; emissive
# cornell > 128 spp with 5), while the measured optima line up on the
# framebuffer's own display-space noise level across all scenes.
AUTO_CROSSOVER_SPP = 64

# Noise anchor for the auto schedule: iterations =
# clamp(round(log2(noise / NOISE_ITERS_REF)), 0, 5), where `noise` is
# estimate_noise(fb)'s own scale. Calibrated against the round-5
# production-size (1200x800) ladders by rendering the same streams and
# recording the ESTIMATOR's value at every ladder point (tools/
# denoise_bench.py + the estimator probe — BENCH.md "Denoising at
# production size"): at 0.005 the schedule stays within one step of the
# measured per-spp display-RMSE optimum on final / three-sphere /
# cornell simultaneously and NEVER picks a worse-than-raw setting at
# any measured point — the property a default needs, which no
# spp-anchored constant achieves (measured crossovers span 16 spp to
# >128 across scenes).
NOISE_ITERS_REF = 0.005


def auto_iterations(spp: int, crossover: int = AUTO_CROSSOVER_SPP) -> int:
    """spp-scheduled iteration count — the auto FALLBACK when no
    framebuffer is at hand (UI previews before the first frame).

    ``iters = clamp(ceil(log2(crossover / spp)), 0, DEFAULT_ITERATIONS)``
    i.e. 5 at <=2 spp, 4 at 4 spp, 3 at 8, 2 at 16, 1 at 32, 0 (raw) at
    >= ``crossover``. The actual filtering path uses
    :func:`noise_iterations` on the framebuffer itself.
    """
    spp = max(1, int(spp))
    if spp >= crossover:
        return 0
    return min(DEFAULT_ITERATIONS, max(1, math.ceil(math.log2(crossover / spp))))


def noise_iterations(noise: float, ref: float = NOISE_ITERS_REF) -> int:
    """Noise-driven iteration count for ``--denoise auto`` (round 5).

    One support doubling per noise octave above the calibrated anchor
    (see NOISE_ITERS_REF). NaN/zero-safe: a clean (or unrendered)
    framebuffer passes through raw.
    """
    if not noise > ref * (2.0 ** -0.5):  # round() threshold, NaN-safe
        return 0
    return min(
        DEFAULT_ITERATIONS,
        max(0, int(round(math.log2(noise / ref)))),
    )


def estimate_noise(fb) -> float:
    """Global noise scalar of a linear framebuffer: the MEDIAN local
    (3x3 Gaussian) luminance sigma of its display-space encode.

    Display space (clip + sRGB) because that is the space the
    production-size ladders are judged in — linear RMSE over-weights
    emissive pixels the display transform compresses (BENCH.md). The
    median rejects true-edge pixels (a minority), so detail-dense
    scenes do not masquerade as noisy. Numpy on purpose: one image
    pass per viewer push, no compile.
    """
    a = np.clip(np.asarray(fb, np.float32), 0.0, 1.0)
    a = np.where(
        a <= 0.0031308,
        a * np.float32(12.92),
        1.055 * np.power(np.maximum(a, 1e-8), 1.0 / 2.4) - 0.055,
    )
    lum = (
        np.float32(_LUM[0]) * a[..., 0]
        + np.float32(_LUM[1]) * a[..., 1]
        + np.float32(_LUM[2]) * a[..., 2]
    )

    def blur(x):
        p = np.pad(x, ((1, 1), (0, 0)), mode="edge")
        x = 0.25 * p[:-2] + 0.5 * p[1:-1] + 0.25 * p[2:]
        p = np.pad(x, ((0, 0), (1, 1)), mode="edge")
        return 0.25 * p[:, :-2] + 0.5 * p[:, 1:-1] + 0.25 * p[:, 2:]

    mu = blur(lum)
    m2 = blur(lum * lum)
    sigma = np.sqrt(np.maximum(m2 - mu * mu, 0.0))
    return float(np.median(sigma))


def aux_buffers(
    scene,
    ray_gen,
    width: int,
    height: int,
    t_min: float,
    t_max: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One primary-hit feature pass → (albedo, normal, depth).

    Deterministic center rays: sub-pixel uniforms 0.5 (the sample
    window's center on both camera modes) and the lens-disk draw pinned
    to the aperture center (``unit_disk_from_uniforms(0, ·) = (0, 0)``).
    Miss lanes get albedo 1 (sky is demodulation-neutral), normal ``-d``
    (smooth across the sky), and depth ``t_max`` (a hard relative-depth
    edge against all geometry).
    """
    n = height * width
    pix = jnp.arange(n, dtype=jnp.uint32)
    ix = (pix % jnp.uint32(width)).astype(jnp.int32)
    iy = (pix // jnp.uint32(width)).astype(jnp.int32)
    half = jnp.full((n,), 0.5, jnp.float32)
    zero = jnp.zeros((n,), jnp.float32)
    o, d = ray_gen(ix, iy, half, half, zero, zero)
    hit = closest_hit(o, d, scene, t_min, t_max)
    hit = apply_texture(hit, image=scene.tex_image)
    one = jnp.ones((n,), jnp.float32)
    albedo = V3.where(hit.mask, hit.albedo, V3(one, one, one))
    normal = V3.where(hit.mask, hit.normal, -d)
    depth = hit.t  # == t_max on miss by closest_hit's contract
    stack = lambda v: jnp.stack(
        [v.x, v.y, v.z], axis=-1
    ).reshape(height, width, 3)
    return stack(albedo), stack(normal), depth.reshape(height, width)


def _shift(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[y, x] = a[clamp(y + dy), clamp(x + dx)] (edge-replicated)."""
    t, b = max(-dy, 0), max(dy, 0)
    l, r = max(-dx, 0), max(dx, 0)
    ap = jnp.pad(a, ((t, b), (l, r)) + ((0, 0),) * (a.ndim - 2), mode="edge")
    return ap[b:b + a.shape[0], r:r + a.shape[1]]


@functools.partial(jax.jit, static_argnums=(4,))
def atrous_denoise(
    fb: jnp.ndarray,
    albedo: jnp.ndarray,
    normal: jnp.ndarray,
    depth: jnp.ndarray,
    iterations: int = DEFAULT_ITERATIONS,
    sigma_color: float = DEFAULT_SIGMA_COLOR,
    sigma_normal: float = DEFAULT_SIGMA_NORMAL,
    sigma_depth: float = DEFAULT_SIGMA_DEPTH,
) -> jnp.ndarray:
    """Filter a linear [H, W, 3] framebuffer with its feature buffers.

    Weights per tap q around pixel p (all edge-stopping):

    * color (noise-adaptive, the SVGF form — Schied et al. 2017):
      ``exp(-|l_p - l_q| / (σ_c · sqrt(var_p) + ε))`` where ``l`` is the
      demodulated luminance and ``var_p`` a local 3×3 Gaussian moment
      estimate of its variance, *recomputed each iteration* from the
      current filtered signal — as noise shrinks, the color weight
      tightens and recovered detail stops re-blurring. Normalizing by
      the noise level makes one σ_c default serve every scene scale and
      sample count (a fixed HDR σ under-smooths exactly when noise is
      worst — measured in tools/denoise_bench.py);
    * normal: ``exp(-|n_p - n_q|² / σ_n²)``;
    * depth:  ``exp(-((t_p - t_q) / (σ_z · max(t_p, t_q)))²)`` —
      *relative* distance, so the same σ works at any scene scale and
      sky (t = t_max) is a hard edge against every surface.
    """
    alb = jnp.maximum(albedo, jnp.float32(ALBEDO_EPS))
    c = fb / alb
    # Sigmas are traced (not static): sigma sweeps (tools/denoise_bench.py)
    # must not recompile the 25-tap graph per combination.
    inv_sn2 = 1.0 / jnp.square(jnp.asarray(sigma_normal, jnp.float32))
    inv_sz = 1.0 / jnp.asarray(sigma_depth, jnp.float32)
    sigma_color = jnp.asarray(sigma_color, jnp.float32)
    lum = lambda a: (
        jnp.float32(_LUM[0]) * a[..., 0]
        + jnp.float32(_LUM[1]) * a[..., 1]
        + jnp.float32(_LUM[2]) * a[..., 2]
    )
    for i in range(int(iterations)):
        step = 1 << i
        l = lum(c)
        mu = jnp.zeros_like(l)
        m2 = jnp.zeros_like(l)
        for gy in range(3):
            for gx in range(3):
                g = jnp.float32(_G3[gy] * _G3[gx])
                lq = _shift(l, gy - 1, gx - 1)
                mu = mu + g * lq
                m2 = m2 + g * lq * lq
        noise = sigma_color * jnp.sqrt(
            jnp.maximum(m2 - mu * mu, 0.0)
        ) + jnp.float32(1e-4)
        num = jnp.zeros_like(c)
        den = jnp.zeros_like(depth)
        for ty in range(5):
            for tx in range(5):
                dy, dx = (ty - 2) * step, (tx - 2) * step
                h = jnp.float32(_B3[ty] * _B3[tx])
                cq = _shift(c, dy, dx)
                nq = _shift(normal, dy, dx)
                zq = _shift(depth, dy, dx)
                dc = jnp.abs(l - _shift(l, dy, dx)) / noise
                dn = jnp.sum((normal - nq) ** 2, axis=-1)
                dz = (depth - zq) * (inv_sz / jnp.maximum(
                    jnp.maximum(depth, zq), jnp.float32(1e-6)
                ))
                w = h * jnp.exp(-dc - dn * inv_sn2 - dz * dz)
                num = num + w[..., None] * cq
                den = den + w
        c = num / den[..., None]  # den >= center tap weight > 0
    return c * alb


class Denoiser:
    """Bound filter: scene features compiled once, reused per frame.

    Built from the *API world* (not a session's compiled scene) so the
    feature pass can pick its own acceleration structure — the flat
    skip-link BVH for large meshes — independent of the rendering
    backend (the cpu/C++ backend's session never compiles one).

    A packed runtime camera (the session's ``scene.cam`` operand, moved
    by ``set_camera``/interactive orbit) is passed per call; feature
    buffers are cached and recomputed only when it changes.
    """

    def __init__(
        self,
        world: api.World,
        width: int,
        height: int,
        iterations: int = DEFAULT_ITERATIONS,
        sigma_color: float = DEFAULT_SIGMA_COLOR,
        sigma_normal: float = DEFAULT_SIGMA_NORMAL,
        sigma_depth: float = DEFAULT_SIGMA_DEPTH,
        t_min: float = 1e-3,
        t_max: float = 1e4,
        auto: bool = False,
    ):
        if iterations < 1:
            raise ValueError(f"denoise iterations must be >= 1, got {iterations}")
        # auto: iteration count follows the accumulated spp passed per
        # call (auto_iterations); ``iterations`` is then the no-spp
        # fallback only.
        self.auto = bool(auto)
        # Originating world, kept so callers reusing a Denoiser as an AOV
        # feature source can verify it was built from the same scene
        # (cli._aov_feature_pass) — width/height alone is not identity.
        self.world = world
        self.width, self.height = int(width), int(height)
        self.iterations = int(iterations)
        self.sigmas = (
            float(sigma_color), float(sigma_normal), float(sigma_depth)
        )
        self._scene = compile_scene(
            world, triangle_bvh=world.triangle_count > 512
        )
        self._t = (float(t_min), float(t_max))
        self._static_gen = cam_mod.make_ray_generator(
            world.camera, self.width, self.height
        )
        self._reference_mode = world.camera.reference_mode
        self._aux = None
        self._aux_cam = None
        self._aux_fns = {}
        self._filters = {}
        self._cam_repr = repr(world.camera)
        self._last_auto = None  # last noise-driven auto count (__call__)
        self._noise_at = None  # (spp, estimate) cache for the auto path
        self.last_noise = None  # last measured estimate (viewer stats)

    def _aux_fn(self, packed: bool, example_args):
        """The feature-pass callable, export-cache backed (utils/cache.py)
        and built lazily per camera mode.

        The primary-hit graph pays full tracing + lowering + compile on
        first use — 470 s measured cold via the remote compile service at
        the headline size (BENCH.md "Denoising"). Routing it through
        ``export_cached_renderer`` (keyed like the session renderers:
        source hash, camera, size, t-window, argument avals) makes warm
        processes deserialize instead; the scene rides as an *operand*,
        so the blob is shared by every world with the same pytree
        structure. Falls back to plain jit when export is unavailable.
        """
        fn = self._aux_fns.get(packed)
        if fn is None:
            from myraytracer_tpu.utils.cache import export_cached_renderer

            if packed:
                def raw(scene, cam):
                    gen = (
                        lambda ix, iy, u1, u2, l1, l2:
                        cam_mod.rays_from_packed(
                            cam, self.width, self.height,
                            ix, iy, u1, u2, l1, l2,
                        )
                    )
                    return aux_buffers(
                        scene, gen, self.width, self.height, *self._t
                    )
            else:
                def raw(scene):
                    return aux_buffers(
                        scene, self._static_gen, self.width, self.height,
                        *self._t,
                    )

            fn, _ = export_cached_renderer(
                raw, example_args,
                key_parts=(
                    "denoise-aux", "packed" if packed else self._cam_repr,
                    self.width, self.height, *self._t,
                ),
            )
            self._aux_fns[packed] = fn
        return fn

    def _features(self, cam):
        # Key the cache by the packed VALUES (76 bytes), not id(cam):
        # orbit loops free each replaced camera array and CPython can
        # recycle the id, which would silently serve the previous
        # view's features.
        key = None if cam is None else np.asarray(cam).tobytes()
        if self._aux is None or key != self._aux_cam:
            if cam is None or self._reference_mode:
                self._aux = self._aux_fn(False, (self._scene,))(self._scene)
            else:
                self._aux = self._aux_fn(True, (self._scene, cam))(
                    self._scene, cam
                )
            self._aux_cam = key
        return self._aux

    def features(self, cam=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """The (albedo [H,W,3], normal [H,W,3], depth [H,W]) feature
        buffers for the current camera — also the CLI's --aov source
        (arbitrary-output-variable sinks reuse this deterministic
        primary-hit pass; cached per camera like the filter path)."""
        return self._features(cam)

    def effective_iterations(self, spp: Optional[int] = None) -> int:
        """Iteration count for reporting/UI: in ``auto`` mode, the last
        noise-driven count an actual __call__ computed (the source of
        truth since round 5), else the spp fallback schedule; fixed
        construction count otherwise."""
        if self.auto:
            if self._last_auto is not None:
                return self._last_auto
            if spp is not None:
                return auto_iterations(spp)
        return self.iterations

    def __call__(self, fb, cam=None, spp: Optional[int] = None) -> jnp.ndarray:
        """Denoise a linear [H, W, 3] framebuffer (np or jnp) → jnp.

        ``cam`` is the session's packed runtime-camera operand
        (``session.scene.cam``), or None for the construction camera.
        In ``auto`` mode the iteration count is NOISE-driven (round 5):
        ``noise_iterations(estimate_noise(fb))`` — the framebuffer's own
        display-space noise level picks the support, which the
        production-size ladders show no spp-anchored constant can do
        across scenes (``spp`` is kept as the pre-first-frame fallback
        path and for API compatibility).
        """
        if self.auto:
            # The estimate costs ~50 ms at 1200x800 (numpy pass) and
            # noise moves like 1/sqrt(spp): reuse it until the
            # accumulation grows 25% (re-estimating immediately when spp
            # moves backwards — an orbit/restart).
            cached = self._noise_at
            if (
                spp is not None and cached is not None
                and cached[0] is not None
                and cached[0] <= spp < cached[0] * 1.25
            ):
                noise = cached[1]
            else:
                noise = estimate_noise(fb)
                self._noise_at = (spp, noise)
            iters = noise_iterations(noise)
            self._last_auto = iters
            self.last_noise = noise
        else:
            iters = self.effective_iterations(spp)
        if iters <= 0:
            return jnp.asarray(fb, jnp.float32)
        albedo, normal, depth = self._features(cam)
        fb = jnp.asarray(fb, jnp.float32)
        filt = self._filters.get(iters)
        if filt is None:
            # Export-cache the 25-tap graph per static iteration count
            # (≤ DEFAULT_ITERATIONS + 1 graphs ever exist — the auto
            # schedule's ladder): 36 s cold CPU / 470 s via the loaded
            # remote service, ~0 warm (BENCH.md "Denoising"). Sigmas stay
            # traced operands, as in the jitted original.
            from myraytracer_tpu.utils.cache import export_cached_renderer

            def raw(fb, albedo, normal, depth, sc, sn, sz):
                return atrous_denoise(
                    fb, albedo, normal, depth, iters, sc, sn, sz
                )

            sig = tuple(jnp.float32(s) for s in self.sigmas)
            filt, _ = export_cached_renderer(
                raw, (fb, albedo, normal, depth, *sig),
                key_parts=(
                    "denoise-filter", iters, self.width, self.height,
                ),
            )
            self._filters[iters] = filt
        return filt(
            fb, albedo, normal, depth,
            *(jnp.float32(s) for s in self.sigmas),
        )


def make_denoiser(
    world: api.World, width: int, height: int, **kwargs
) -> Optional[Denoiser]:
    """CLI-facing constructor (see Denoiser)."""
    return Denoiser(world, width, height, **kwargs)
