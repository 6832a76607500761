"""Fused Pallas trace megakernel with path regeneration (TPU).

One kernel program traces a tile of rays through a whole frame's work:
camera ray generation, the full bounce loop, closest-hit over the sphere
set, masked material scatter, and radiance accumulation over a window of
samples — with the wavefront state (origin, direction, throughput,
radiance, active mask) living in VMEM/vregs for the whole loop. HBM
traffic is only the final radiance tile (the jnp oracle round-trips the
wavefront through HBM every bounce).

**Path regeneration** is the core utilization trick: each lane owns one
pixel and traces its samples *sequentially* — the moment a lane's path
retires (sky miss, absorption, depth exhaustion), the same loop iteration
regenerates it with the next sample's camera ray. A plain masked bounce
loop pays full width as long as *any* of the tile's ~1000 lanes survives
(survival of one ray keeps everyone spinning to depth 50); with
regeneration, the loop runs ≈ samples × expected-path-length iterations
at ~full lane utilization, ending exactly when every lane exhausts its
sample window. This replaces the reference's "one fragment thread = one
pixel, loop over samples inside" (shader.wgsl:372-386) with a design that
keeps SIMD lanes busy.

Other layout choices (TPU-first, each measured on v5e):

* rays occupy a [TM, 128] (sublane × lane) tile; TM=16 balances register
  residency against gate amortization (TM=8 halves the rays each fixed
  gate serves, TM≥24 spills — 32 measured 10-100x slower);
* each tile maps to a compact BLOCK_W × (tile/BLOCK_W) **pixel block**
  (64×32 default) rather than a scanline strip: the tighter ray frustum
  makes the chunk-AABB gates skip far more work (+34% on the final
  scene); the caller unscrambles the output with a static gather;
* the sphere/triangle SoA rides in SMEM via scalar prefetch; closest-hit
  sweeps primitives broadcasting each one's scalars against the ray tile
  with a running t_best — the vector analog of the reference's
  shrinking-window scan (shader.wgsl:314-329), with no gathers. Unrolled
  sweeps tree-combine SWEEP_WIDTH independent candidates before touching
  the carry (exact; -24% frame time at spp 32 — the sweep was
  latency-bound on the carry's select chain). Scenes above CULL_MIN
  primitives sweep Morton-sorted CULL_CHUNK-sized chunks behind
  per-chunk AABB ``lax.cond`` gates (conservative ⇒ results are
  identical), except the first LEADERS slots — the scene compiler hoists
  the largest spheres there and they sweep unconditionally, so a giant
  sphere (RTiOW's ground) cannot inflate its chunk's AABB into a box
  every ray enters every bounce. Past SUPER_MIN chunks a second gate
  level (SUPER chunks per outer AABB) bounds the per-bounce gate scan —
  an implicit two-level BVH over the Morton order, replacing the
  traversal stack a GPU BVH would use with nested static gates;
* the winner's record (center/inv_r for the normal, albedo/fuzz/ior/mat)
  rides the sweep carry, overwritten on every ``better`` lane — the last
  improvement in sweep order leaves exactly the final winner's data, so
  no winner index is ever materialized and there is no second fetch pass
  (a separate gated fetch sweep measured ~30% of frame time:
  tools/ablate.py; merging it in was -20% frame time: tools/sweep.py).

RNG, camera mapping, and material scatter are the *same jnp functions*
the oracle integrator uses (core/rng.py, render/camera.py,
render/materials.py) — elementwise code runs unchanged inside Pallas — so
the kernel consumes the identical threefry (pixel, sample, bounce) stream
and reproduces the oracle image up to f32 sum order.

Determinism contract: same code path + same platform + same key ⇒
identical bits (what checkpoint/resume and the golden tests rely on),
and all kernel config variants (cull on/off, merged fetch on/off, chunk
sizes, tile shapes) are bit-identical to each other. *Cross-compiler*
parity (kernel vs oracle) is exact on the preset scenes but only
statistical in the limit: on dense random scenes, ray-sphere encounters
whose discriminant sits within an ulp of zero can flip hit/miss between
Mosaic and XLA (different FMA contraction of the quadratic) — both
outcomes are valid renders; see tools/parity_stress.py for the measured
envelope.

Mosaic portability notes (learned on real v5e):

* no uint32→f32 cast (route through int32), no cbrt (exp2/log2 form), no
  bool (i1) vectors in while-loop carries (carry int32 masks), and no
  selects *producing* bool vectors (use boolean algebra);
* index math in int32 — the vector ISA has no u32 div/rem.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.render import camera as cam_mod
from myraytracer_tpu.render.hit import TRI_DET_EPS, Hit
from myraytracer_tpu.render.materials import color_sky, scatter
from myraytracer_tpu.render.textures import apply_texture
from myraytracer_tpu.scene.api import Camera
from myraytracer_tpu.scene.compile import (
    LEADERS,
    TRI_CHUNK_AUTO,
    CompiledScene,
)

LANES = 128
# Pixel-block width per tile (block height = tile_size / BLOCK_W).
BLOCK_W = 64
# Sphere sweeps with at most this many spheres are fully unrolled (python
# loop) so Mosaic can software-pipeline the SMEM scalar loads.
UNROLL_MAX = 64
# Above this sphere count the hit/fetch sweeps run chunked with per-chunk
# AABB culling (requires a spatially-sorted scene for locality). With the
# scene's giant spheres hoisted into the ungated LEADERS prologue and the
# round-5 kd partition (compile_scene partition="kd": balanced
# longest-axis splits aligned to CULL_CHUNK groups, −49% total chunk AABB
# surface vs the Morton curve), 48-sphere chunks measured best across
# both sphere regimes — −8% frame time on the 486-sphere final scene and
# −21% at 40k spheres vs the old morton/32 (tools/sweep.py, BENCH.md
# "Per-ray culling"). Finer chunks lose to per-gate any() reductions
# (16: +4..5%), coarser to swept-pair growth (128: ~0 vs morton/32).
CULL_MIN = 64
CULL_CHUNK = 48
# Triangle chunk width is scene-size dependent (KernelConfig.TRI_CHUNK=0
# = auto, resolve_tri_chunk): the Möller-Trumbore interior is ~40
# ops/primitive, so once gates go dynamic the win flips from fewer gates
# to fewer triangles swept per opened gate. Measured (tools/sweep.py,
# mesh:N icospheres, 480x270 spp 8 depth 8): 64 best at 420 tris (32/96
# worse), 32 best at 1.3k-5k (-6..7% vs 64), 16 best at 20k+ (-24% vs
# 64, -10% vs 32); 8 loses again to per-gate any() reductions.
TRI_CHUNK = 64
# The auto ladder lives in scene/compile.py (imported below) so the kd
# partitioner can align its triangle groups to the kernel's chunk width
# without a circular import.
# Two-level culling: group SUPER consecutive chunks under one outer AABB
# gate once the chunk count reaches SUPER_MIN — an implicit two-level BVH
# over the Morton order (the TPU-native answer to the reference's absent
# BVH, SURVEY.md §7.1 step 8: no gathers, no traversal stack, just nested
# lax.cond gates over SMEM-resident bounds). Per bounce the gate scan is
# O(n_super + entered·SUPER) instead of O(n_chunks). Conservative ⇒
# bitwise-identical results.
SUPER = 8
SUPER_MIN = 24
# Gate the winner-fetch sweeps per chunk (an any() reduction each); with
# few chunks the gates may cost more than they save — tunable for bench.
GATED_FETCH = True
# Carry the provisional winner's record through the hit sweep (selects on
# `better`) instead of a separate fetch pass. Exact: the last improvement
# in sweep order leaves the final winner's data, identical to the
# post-sweep fetch. tools/ablate.py measured the separate fetch pass at
# ~30% of frame time on the final scene; merging it measured -20% frame
# time (tools/sweep.py). In merged mode the winner *index* is never
# materialized — a tri_flag carry distinguishes triangle winners.
MERGED_FETCH = True
# Unrolled chunk interiors compile-blow-up past ~1k primitives; larger
# scenes run a fori_loop inside each gate instead.
UNROLL_TOTAL_MAX = 1024
# Tree-combine width for the unrolled merged-fetch sphere sweeps: W sphere
# candidates are computed independently, reduced pairwise (strict <, so
# the earliest index still wins ties — exactly the sequential semantics),
# and merged into the carry once. Same op count as the sequential sweep
# but the serial select chain through the (t_best + record) carry shrinks
# ~W×, giving Mosaic independent work to hide VPU latency with. Bitwise
# identical to width 1. Measured on v5e (final scene, spp 32): w2 -9.9%,
# w4 -24.1%, w8 -23.5% frame time vs w1 — the sweep was latency-bound on
# the carry chain, not SMEM- or ALU-bound.
SWEEP_WIDTH = 4
# Guard the quadratic's discriminant (max(disc,0) + disc>=0 in `valid`).
# With the guard off, sqrt(disc<0) = NaN and every window comparison on a
# NaN t is false, so `valid` is false exactly as before — identical
# winners with ~3 fewer VPU ops per sphere per ray.
SQRT_GUARD = False
# Fused t-window tests (exact, ~4 fewer ops per sphere per ray):
# the near root needs only the t1 >= t_min test (t1 >= t_max implies
# t2 >= t_max, which the final compare rejects anyway), and the upper
# window bound is redundant everywhere because the no-hit sentinel equals
# t_max and t_best only decreases — t_cand < t_best subsumes
# t_cand < t_max. Candidates above t_max flow unclamped through the pair
# tree but can never win a carry merge. False = the spelled-out window
# logic, kept for A/B verification.
WINDOW_FUSE = True
# Rays per tile = tile_rows * 128. Keep the live wavefront state near the
# vector register file: measured on v5e, 16 rows (2 vregs per array — two
# independent dependency chains to hide VPU latency) beats 8 by ~20%, and
# 24+ spills (32 rows measured 10-100x slower).
DEFAULT_TILE_ROWS = 16
PAD_CENTER = 3e30  # pad-slot cx: the hit quadratic overflows → never valid


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Explicit kernel tuning/experiment knobs.

    Threaded through ``make_block_renderer``/``make_renderer`` so tools
    and tests build variants instead of mutating module state (a forgotten
    reset would silently leak config across runs). Field defaults are the
    measured-best production values — the module constants documented
    above. Uppercase names match the historical constant names so sweep
    variant tables and BENCH.md stay readable.
    """

    BLOCK_W: int = BLOCK_W
    UNROLL_MAX: int = UNROLL_MAX
    CULL_MIN: int = CULL_MIN
    CULL_CHUNK: int = CULL_CHUNK
    # 0 = auto: scene-size-dependent width (TRI_CHUNK_AUTO ladder);
    # nonzero forces the width (tools/sweep.py A/B variants).
    TRI_CHUNK: int = 0
    SUPER: int = SUPER
    SUPER_MIN: int = SUPER_MIN
    GATED_FETCH: bool = GATED_FETCH
    MERGED_FETCH: bool = MERGED_FETCH
    UNROLL_TOTAL_MAX: int = UNROLL_TOTAL_MAX
    SWEEP_WIDTH: int = SWEEP_WIDTH
    SQRT_GUARD: bool = SQRT_GUARD
    WINDOW_FUSE: bool = WINDOW_FUSE
    # Triangle table placement: None = auto (SMEM while it fits, else
    # VMEM), True/False forces. The VMEM path lifts the SMEM prefetch cap
    # (~16k triangles) to the VMEM budget (~190k at 512 B/primitive) at
    # the price of vector-memory scalar reads in the sweep (~1.8x on the
    # sweep, measured); chunk/super AABB gates stay in SMEM either way.
    TRI_VMEM: Optional[bool] = None
    # Sphere table placement, same scheme (SMEM caps at ~25k spheres).
    SPH_VMEM: Optional[bool] = None
    # Chunk gates are python-unrolled (one lax.cond each) up to this many
    # chunks; beyond, the gate scan runs as a fori_loop with dynamic
    # chunk indices so compile time stays bounded at 100k+ triangles.
    CHUNK_UNROLL_MAX: int = 96
    # Ablation hook (tools/ablate.py): names of kernel-body components to
    # *duplicate* with an opaque runtime-zero perturbation; the dup's
    # outputs fold into the segment counter times an opaque 0.0, so Mosaic
    # can neither CSE nor DCE it and runtime results stay bit-identical.
    # The marginal frame time of a dup is that component's in-situ cost.
    ABLATE: tuple = ()
    # None = cull iff n_spheres > CULL_MIN; True/False forces the
    # chunk-AABB culled sweep on/off (tools/sweep.py A/B).
    FORCE_CULL: Optional[bool] = None
    # Bake the general camera into the compiled kernel (the
    # pre-runtime-camera path) instead of reading the packed SMEM operand.
    STATIC_CAM: bool = False
    # --- Per-ray culling experiments (tools/sweep.py A/B; BENCH.md
    # "Per-ray culling") -------------------------------------------------
    # AND each sphere chunk's per-lane slab mask into ``better`` for the
    # duration of that chunk's sweep: a lane whose ray cannot enter the
    # chunk AABB before its current t_best contributes a provable no-op
    # instead of a real candidate. Exact (the mask is the conservative
    # slab test the gate already computes), no control flow — but on SIMD
    # lanes the candidates are still computed, so this can only win if
    # masking shortens the carry-select critical path for Mosaic.
    LANE_GATE: bool = False
    # Diagnostic only: sqrt(disc) as disc * rsqrt(disc). Differs from the
    # production stream in ulps (and drops exact-tangent hits, disc == 0),
    # so it can never ship — it exists to measure how much of the sweep's
    # 3.7x latency-over-ALU factor is the sqrt dependency chain.
    SQRT_RSQRT: bool = False

    def replace(self, **kw) -> "KernelConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = KernelConfig()

# v5e SMEM is 1 MiB and every scalar-prefetch operand lives there. Past
# ~25k spheres / ~18k triangles the primitive tables move to VMEM
# (SPH_VMEM/TRI_VMEM auto mode — ~190k primitives at 512 B each) and only
# the chunk/super AABB gate tables stay in SMEM; dispatch.make_session
# routes to the jnp oracle only when even those overflow (tens of
# millions of primitives).
SMEM_BUDGET = 1 << 20


def resolve_tri_chunk(cfg: "KernelConfig", n_tris: int) -> int:
    """Effective triangle chunk width for a scene.

    An explicit ``cfg.TRI_CHUNK`` wins; 0 (the default) picks from the
    measured ``TRI_CHUNK_AUTO`` ladder by triangle count. Thresholds are
    multiples of 64 and comparisons are ``<=``, so resolving on the
    chunk-padded table width (what the kernel body sees) agrees with
    resolving on the raw count (what the prefetch packer sees).
    """
    if cfg.TRI_CHUNK:
        return cfg.TRI_CHUNK
    for bound, chunk in TRI_CHUNK_AUTO:
        if bound is None or n_tris <= bound:
            return chunk
    raise AssertionError("unreachable")


def sph_table_rows(textured: bool) -> int:
    """Sphere-table rows: cx cy cz r ar ag ab fz ior (+ a2r a2g a2b tsc
    on textured scenes — render/textures.py)."""
    return 13 if textured else 9


def tri_table_rows(textured: bool) -> int:
    """Triangle-table rows: v0(3) e1(3) e2(3) albedo(3) fuzz ior (+ the
    4 texture rows on textured scenes)."""
    return 18 if textured else 14


def estimated_prefetch_bytes(
    n_spheres: int, n_tris: int, cfg: "KernelConfig" = None,
    tri_table_in_smem: bool = True, sph_table_in_smem: bool = True,
    textured: bool = False,
) -> int:
    """Upper-bound bytes of the kernel's SMEM prefetch operands.

    With ``tri_table_in_smem=False`` (resp. ``sph_table_in_smem``) the
    primitive table rides VMEM (KernelConfig.TRI_VMEM / SPH_VMEM) and
    only its chunk/super AABB gate tables count against SMEM.
    """
    cfg = cfg or DEFAULT_CONFIG
    tc = resolve_tri_chunk(cfg, n_tris)
    srows = sph_table_rows(textured)
    trows = tri_table_rows(textured)
    sph = (srows * (n_spheres + LEADERS + cfg.CULL_CHUNK)
           if sph_table_in_smem else srows)
    tri = trows * (n_tris + tc) if (n_tris and tri_table_in_smem) else trows
    chunks = (n_spheres // cfg.CULL_CHUNK + 1) + (n_tris // tc + 1)
    supers = chunks // cfg.SUPER + 2
    # Non-table operands: packed camera (19) + meta (4) + row0 (1).
    other = cam_mod.PACKED_CAMERA_SIZE + 5
    return 4 * (sph + tri + 6 * (chunks + supers) + other)


def fits_in_smem(
    n_spheres: int, n_tris: int, cfg: "KernelConfig" = None,
    tri_table_in_smem: bool = True, sph_table_in_smem: bool = True,
    textured: bool = False,
) -> bool:
    # Keep headroom for Mosaic's own SMEM use (control state, etc.).
    return (
        estimated_prefetch_bytes(
            n_spheres, n_tris, cfg, tri_table_in_smem, sph_table_in_smem,
            textured,
        )
        <= SMEM_BUDGET - 64 * 1024
    )


def _pack_mat_bits(values_x, fuzz, mat_ty, material_set):
    """Pack the material-type index into the SIGN bits of (albedo_r, fuzz).

    ``idx = signbit(albedo_r) + 2*signbit(fuzz)`` indexes
    ``sorted(material_set)``. Albedo and fuzz are nonnegative by API
    contract and ``|-0.0| == 0.0``, so the packing is lossless — the
    kernel recovers exact values with ``abs`` and never needs a separate
    material-id row (one fewer SMEM read + select + carried array per
    sweep step). Pad slots (mat_ty 0) match nothing → idx 0 → unchanged.
    """
    ms = sorted(material_set)
    idx = jnp.zeros_like(mat_ty)
    for j, m in enumerate(ms):
        idx = jnp.where(mat_ty == m, j, idx)
    vx = jnp.where((idx & 1) == 1, -values_x, values_x)
    fz = jnp.where((idx >> 1) == 1, -fuzz, fuzz)
    return vx, fz


def _super_aabb(aabb, cfg: "KernelConfig"):
    """Group chunk AABBs into SUPER-wide outer bounds ([6, n_super]).

    Returns a dummy [6, 1] zero table when there are too few chunks for
    the two-level gating (the kernel statically skips it then; Mosaic
    rejects zero-sized prefetch operands).
    """
    SUPER, SUPER_MIN = cfg.SUPER, cfg.SUPER_MIN
    n_chunks = aabb.shape[1]
    if n_chunks < SUPER_MIN:
        return jnp.zeros((6, 1), jnp.float32)
    big = jnp.float32(3e38)
    pad = (-n_chunks) % SUPER
    if pad:
        inv = jnp.stack([big] * 3 + [-big] * 3).reshape(6, 1)
        aabb = jnp.concatenate([aabb, jnp.tile(inv, (1, pad))], axis=1)
    n_super = aabb.shape[1] // SUPER
    lo = aabb[:3].reshape(3, n_super, SUPER).min(axis=2)
    hi = aabb[3:].reshape(3, n_super, SUPER).max(axis=2)
    return jnp.concatenate([lo, hi], axis=0)


def _tex_ids(texture_set) -> tuple:
    """Texture-id alphabet for the sign-bit packing: solid (0) is always
    present (pads / untextured primitives)."""
    return tuple(sorted({0, *texture_set}))


def _tri_prefetch(
    scene: CompiledScene, material_set, cfg: "KernelConfig", texture_set=(),
):
    textured = bool(texture_set)
    TRI_CHUNK = resolve_tri_chunk(
        cfg, scene.tris.v0.x.shape[0] if scene.has_triangles else 0
    )
    # Triangle tables: rows v0(3), e1(3), e2(3), albedo(3), fuzz, ior —
    # material type packed into albedo_r/fuzz signs exactly as for
    # spheres (+ the 4 texture rows on textured scenes, packed the same
    # way). A dummy degenerate row keeps the prefetch arity fixed for
    # triangle-free scenes (n_tris=0 skips the sweep statically).
    if scene.has_triangles:
        tr = scene.tris
        tarx, tfzp = _pack_mat_bits(
            tr.albedo.x, tr.fuzz, tr.mat_ty.astype(jnp.int32), material_set
        )
        rows = [
            tr.v0.x, tr.v0.y, tr.v0.z,
            tr.e1.x, tr.e1.y, tr.e1.z,
            tr.e2.x, tr.e2.y, tr.e2.z,
            tarx, tr.albedo.y, tr.albedo.z,
            tfzp, tr.ior,
        ]
        if textured:
            ta2r, tscp = _pack_mat_bits(
                tr.albedo2.x, tr.tex_scale, tr.tex_ty.astype(jnp.int32),
                _tex_ids(texture_set),
            )
            rows += [ta2r, tr.albedo2.y, tr.albedo2.z, tscp]
        trf = jnp.stack(rows)
        tpad = (-trf.shape[1]) % TRI_CHUNK
        if tpad:
            trf = jnp.pad(trf, ((0, 0), (0, tpad)))  # degenerate pads
        tn_chunks = trf.shape[1] // TRI_CHUNK
        v0x, v0y, v0z = trf[0], trf[1], trf[2]
        v1x, v1y, v1z = v0x + trf[3], v0y + trf[4], v0z + trf[5]
        v2x, v2y, v2z = v0x + trf[6], v0y + trf[7], v0z + trf[8]
        deg = (
            trf[3] * trf[3] + trf[4] * trf[4] + trf[5] * trf[5]
            + trf[6] * trf[6] + trf[7] * trf[7] + trf[8] * trf[8]
        ) == 0.0
        tbig = jnp.float32(3e38)
        tlo = jnp.stack([
            jnp.where(deg, tbig, jnp.minimum(jnp.minimum(a, b), c))
            .reshape(tn_chunks, TRI_CHUNK).min(axis=1)
            for a, b, c in ((v0x, v1x, v2x), (v0y, v1y, v2y), (v0z, v1z, v2z))
        ])
        thi = jnp.stack([
            jnp.where(deg, -tbig, jnp.maximum(jnp.maximum(a, b), c))
            .reshape(tn_chunks, TRI_CHUNK).max(axis=1)
            for a, b, c in ((v0x, v1x, v2x), (v0y, v1y, v2y), (v0z, v1z, v2z))
        ])
        traabb = jnp.concatenate([tlo, thi], axis=0)
    else:
        trf = jnp.zeros((tri_table_rows(textured), 1), jnp.float32)
        traabb = jnp.zeros((6, 1), jnp.float32)
    return trf, traabb, _super_aabb(traabb, cfg)


def _scene_to_prefetch(
    scene: CompiledScene, material_set, cfg: "KernelConfig", texture_set=(),
):
    """Pack the SoA scene into the SMEM prefetch layout.

    Rows of the f32 table: cx, cy, cz, r (signed radius), albedo_r,
    albedo_g, albedo_b, fuzz, ior — with the material-type index packed
    into the sign bits of albedo_r/fuzz (see ``_pack_mat_bits``). The
    kernel derives ``radius² = r·r`` (the same IEEE product the scene
    compiler stores) and ``1/r`` (correctly-rounded divide — identical to
    the compiled ``inv_radius``), so one row replaces two.

    Textured scenes (render/textures.py) add rows 9-12: albedo2_r,
    albedo2_g, albedo2_b, tex_scale, with the texture-type index packed
    into the sign bits of albedo2_r/tex_scale by the same scheme.

    Pad slots — both the scene compiler's (``radius_sq < 0``) and the
    CULL_CHUNK alignment pads added here — are relocated to
    ``cx = PAD_CENTER``: the quadratic's ``|oc|²`` overflows to inf and
    ``disc`` becomes -inf/NaN, which never passes ``valid`` (NaN
    comparisons are false). The AABB table excludes them by the same
    center test (an all-pad chunk gets an inverted box, always culled).

    Returns (f32 table, chunk AABBs, triangle table, triangle AABBs).
    """
    CULL_CHUNK = cfg.CULL_CHUNK
    textured = bool(texture_set)
    if textured != (scene.tex_ty is not None):
        raise ValueError(
            "texture_set/scene mismatch: the kernel was built with "
            f"texture_set={texture_set!r} but the scene "
            f"{'carries' if scene.tex_ty is not None else 'lacks'} texture "
            "rows — pass texture_set=world.texture_set to the renderer "
            "factory"
        )
    is_pad = scene.radius_sq < 0.0
    arx, fzp = _pack_mat_bits(
        scene.albedo.x, scene.fuzz, scene.mat_ty.astype(jnp.int32),
        material_set,
    )
    rows = [
        jnp.where(is_pad, jnp.float32(PAD_CENTER), scene.center.x),
        scene.center.y,
        scene.center.z,
        scene.radius,  # pads: 1.0 (harmless — relocated far away)
        arx,
        scene.albedo.y,
        scene.albedo.z,
        fzp,
        scene.ior,
    ]
    if textured:
        a2r, tscp = _pack_mat_bits(
            scene.albedo2.x, scene.tex_scale, scene.tex_ty.astype(jnp.int32),
            _tex_ids(texture_set),
        )
        rows += [a2r, scene.albedo2.y, scene.albedo2.z, tscp]
    f32 = jnp.stack(rows)
    # The first LEADERS slots sweep unconditionally (compile_scene hoists
    # the largest spheres there); chunk-AABB culling covers only the rest,
    # so pad the table to LEADERS + k*CULL_CHUNK.
    pad = (LEADERS - f32.shape[1]) % CULL_CHUNK
    if pad:
        f32 = jnp.pad(f32, ((0, 0), (0, pad)))
        f32 = f32.at[0, -pad:].set(PAD_CENTER)
        f32 = f32.at[3, -pad:].set(1.0)

    ck = f32[:, LEADERS:]  # the chunk-culled portion
    n_chunks = ck.shape[1] // CULL_CHUNK
    if n_chunks == 0:
        # Small scene: everything fits in the unrolled sweep, no culling.
        # Mosaic rejects zero-sized prefetch operands, so pass a dummy row.
        return (
            f32,
            jnp.zeros((6, 1), jnp.float32),
            jnp.zeros((6, 1), jnp.float32),
            *_tri_prefetch(scene, material_set, cfg, texture_set),
        )
    is_pad = ck[0] > jnp.float32(1e29)
    r_abs = jnp.abs(ck[3])
    big = jnp.float32(3e38)
    lo = jnp.stack([
        jnp.where(is_pad, big, ck[k] - r_abs).reshape(n_chunks, CULL_CHUNK).min(axis=1)
        for k in range(3)
    ])
    hi = jnp.stack([
        jnp.where(is_pad, -big, ck[k] + r_abs).reshape(n_chunks, CULL_CHUNK).max(axis=1)
        for k in range(3)
    ])
    aabb = jnp.concatenate([lo, hi], axis=0)  # [6, n_chunks]

    return (
        f32, aabb, _super_aabb(aabb, cfg),
        *_tri_prefetch(scene, material_set, cfg, texture_set),
    )


def _trace_kernel(
    # scalar-prefetch refs (SMEM):
    sf_smem_ref,  # [9, N] f32 scene table (cx cy cz r ar ag ab fz ior; see
    #          _scene_to_prefetch — material type in ar/fz sign bits);
    #          [9, 1] dummy when the table rides VMEM (SPH_VMEM)
    aabb_ref,  # [6, n_chunks] f32 chunk bounds (culled sweeps only)
    saabb_ref,  # [6, n_super] f32 superchunk bounds (two-level culling)
    trf_smem_ref,  # [14, T] f32 triangle table (v0, e1, e2, albedo, fuzz,
    #                ior) — [14, 1] dummy when the table rides VMEM
    traabb_ref,  # [6, t_chunks] f32 triangle chunk bounds
    tsaabb_ref,  # [6, t_super] f32 triangle superchunk bounds
    camf_ref,  # [19] f32 packed thin-lens camera ([1] dummy in ref mode)
    meta_ref,  # [4] u32: key0, key1, sample_start, n_valid
    row0_ref,  # [1] u32: first image row of this block invocation
    # then: optional VMEM triangle table (tri_vmem), the 4 outputs
    # (r, g, b, segs), and the frame-bucket scratch (multi-frame mode):
    *rest,
    width: int,
    n_rows: int,
    n_spheres: int,
    n_tris: int,
    depth: int,
    t_min: float,
    t_max: float,
    tile_rows: int,
    ray_gen_factory,
    material_set,
    cull: bool,
    rng_mode: str,
    cfg: KernelConfig,
    texture_set=(),
    static_ior=None,
    frames: int = 1,
    spp: int = 0,
    tri_vmem: bool = False,
    sph_vmem: bool = False,
    sky=None,
    lens_draws: bool = True,
    nee_lights=None,
    adaptive: bool = False,
    qmc: bool = False,
    rr: int = 0,
):
    if adaptive:
        # Adaptive mode (make_adaptive_renderer): two extra scalar-prefetch
        # operands give each grid step its own pixel block and per-block
        # sample cursor — one compiled kernel renders any block subset.
        bid_ref, samp0_ref, rest = rest[0], rest[1], rest[2:]
    if sph_vmem:
        sf_ref, rest = rest[0], rest[1:]

        def sread(row, si):
            # VMEM sphere table is [N, 9] — same sublane-dynamic-index
            # rule as the triangle table (see tread below).
            return sf_ref[si, row]
    else:
        sf_ref = sf_smem_ref

        def sread(row, si):
            return sf_ref[row, si]
    if tri_vmem:
        trf_ref, rest = rest[0], rest[1:]

        def tread(row, ti):
            # VMEM table is [T, 14] (triangle on the SUBLANE dim): Mosaic
            # cannot scalar-load at a dynamic LANE index ("index in
            # dimension 1 must be a multiple of 128"), but dynamic
            # sublane indexing lowers fine. VMEM scalar reads cost the
            # mesh sweep ~1.8x vs SMEM (measured; an explicit
            # one-row-load-per-triangle variant was identical — the
            # loads are already coalesced, the cost is the dynamic
            # address dependency).
            return trf_ref[ti, row]
    else:
        trf_ref = trf_smem_ref

        def tread(row, ti):
            return trf_ref[row, ti]
    r_ref, g_ref, b_ref, segs_ref = rest[:4]
    scratch_refs = rest[4:]
    # Shadow the module-level tuning constants with the threaded config:
    # the kernel body (including every nested function) reads only these.
    BLOCK_W = cfg.BLOCK_W
    UNROLL_MAX = cfg.UNROLL_MAX
    CULL_CHUNK = cfg.CULL_CHUNK
    TRI_CHUNK = resolve_tri_chunk(cfg, n_tris)
    SUPER = cfg.SUPER
    SUPER_MIN = cfg.SUPER_MIN
    GATED_FETCH = cfg.GATED_FETCH
    MERGED_FETCH = cfg.MERGED_FETCH
    UNROLL_TOTAL_MAX = cfg.UNROLL_TOTAL_MAX
    SWEEP_WIDTH = cfg.SWEEP_WIDTH
    SQRT_GUARD = cfg.SQRT_GUARD
    WINDOW_FUSE = cfg.WINDOW_FUSE
    LANE_GATE = cfg.LANE_GATE
    SQRT_RSQRT = cfg.SQRT_RSQRT

    nee = bool(nee_lights)
    tile = pl.program_id(0)
    ray_gen = ray_gen_factory(camf_ref)

    key = (meta_ref[0], meta_ref[1])
    # Russian-roulette decisions ride a derived key over the bounce draw
    # id (crng.RR_KEY_FOLD): independent of every main-stream draw, no
    # slot consumed, hoisted out of the while body (scalar threefry once).
    rr_key = crng.fold_key(key, crng.RR_KEY_FOLD) if rr else None
    # Adaptive rounds give every tile its own sample cursor (a pixel's
    # n-th sample is the same draw no matter when its block is scheduled).
    sample_start = samp0_ref[tile] if adaptive else meta_ref[2]
    n_valid_i = meta_ref[3].astype(jnp.int32)
    row0 = row0_ref[0]

    abl = frozenset(cfg.ABLATE)
    # Opaque runtime zeros (n_valid < 2^31): inputs perturbed by these are
    # not CSE-able, and outputs multiplied by them fold to exact 0.0.
    kill_i = (meta_ref[3] >> jnp.uint32(31)).astype(jnp.int32)
    kill_f = kill_i.astype(jnp.float32)

    shape = (tile_rows, LANES)
    tile_size = tile_rows * LANES

    # Multi-frame mode: one call renders `frames` progressive frames of
    # `spp` samples each (n_valid = frames*spp). Lanes regenerate straight
    # across frame boundaries — the whole window shares ONE regeneration
    # tail instead of paying max-lane-path-length per frame, which is what
    # makes small-spp progressive rendering throughput-bound rather than
    # tail-bound. Per-sample radiance flushes into per-frame VMEM buckets
    # at regeneration, so each frame's image is bitwise identical to a
    # separate single-frame call (same draws, same per-lane sum order).
    multi = frames > 1
    if multi:
        sc_r, sc_g, sc_b = scratch_refs
        zero_buckets = jnp.zeros((frames, tile_rows, LANES), jnp.float32)
        sc_r[...] = zero_buckets  # scratch persists across grid steps
        sc_g[...] = zero_buckets
        sc_b[...] = zero_buckets

    # Lane → global pixel coordinates (int32 math; u32 only at the RNG).
    # Tiles map to compact BLOCK_W × block_h pixel blocks, not scanline
    # strips: a 2048-ray tile covering 64x32 pixels has a far tighter ray
    # frustum than a 1.7-row strip across the whole image, so the
    # chunk-AABB gates skip much more (the caller unscrambles the output
    # with a static gather).
    block_h = tile_size // BLOCK_W
    blocks_x = -(-width // BLOCK_W)
    local = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * jnp.int32(LANES)
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    )
    if adaptive:
        # The tile's pixel block is chosen by the prefetch operand, not
        # the grid position. The sentinel id (one past the block grid)
        # maps every lane out of image: the tile retires before its
        # first bounce and contributes nothing (padding short rounds).
        bid = bid_ref[tile].astype(jnp.int32)
    else:
        bid = tile
    bx = bid % jnp.int32(blocks_x)
    by = bid // jnp.int32(blocks_x)
    ix = bx * jnp.int32(BLOCK_W) + local % jnp.int32(BLOCK_W)
    iy_local = by * jnp.int32(block_h) + local // jnp.int32(BLOCK_W)
    in_image = (ix < jnp.int32(width)) & (iy_local < jnp.int32(n_rows))
    iy = iy_local + row0.astype(jnp.int32)
    lane_id = (iy * jnp.int32(width) + ix).astype(jnp.uint32)

    t_minf = jnp.float32(t_min)
    t_maxf = jnp.float32(t_max)

    if rng_mode == "hw":
        # TPU hardware PRNG: ~60x cheaper per draw than threefry, at the
        # cost of a different (still deterministic per (key, frame, tile))
        # sample stream — opt-in, not oracle-parity.
        # Single scalar seed (multi-operand prng_seed crashes this
        # environment's AOT compile helper): mix key, frame window, tile.
        # Both key words must feed the seed: key_from_seed puts ordinary
        # seeds (< 2^32) entirely in key[1], so mixing only key[0] would
        # make every user seed produce the identical hw stream.
        seed = (
            meta_ref[0].astype(jnp.int32)
            ^ (meta_ref[1].astype(jnp.int32) * jnp.int32(-1028477387))
            ^ (meta_ref[2].astype(jnp.int32) * jnp.int32(-1640531527))
            ^ (tile * jnp.int32(-2048144789))
        )
        pltpu.prng_seed(seed)

        def _hw_uniform():
            bits = pltpu.prng_random_bits(shape)
            hi24 = (pltpu.bitcast(bits, jnp.uint32) >> jnp.uint32(8)).astype(
                jnp.int32
            )
            return hi24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))

        def draw2(_draw_slot):
            return _hw_uniform(), _hw_uniform()
    else:

        def draw2(draw_slot):
            return crng.uniform2(key, lane_id, draw_slot)

    def camera_ray(s_vec):
        """Camera ray for per-lane sample index vector (oracle draw slots)."""
        sample_id = sample_start + s_vec.astype(jnp.uint32)
        if qmc:
            # Scrambled-Sobol camera pairs (core/rng.py) — the same pure
            # functions the jnp oracle calls, so QMC frames stay bitwise
            # identical across backends. The slot 0/1 threefry draws are
            # skipped (absolute slots: nothing else shifts).
            u1, u2 = crng.qmc_camera_uniforms(key, lane_id, sample_id, 0)
            if lens_draws:
                l1, l2 = crng.qmc_camera_uniforms(key, lane_id, sample_id, 1)
            else:
                l1 = l2 = jnp.zeros(shape, jnp.float32)
            return ray_gen(ix, iy, u1, u2, l1, l2)
        cam_draw = sample_id * jnp.uint32(crng.DRAWS_PER_SAMPLE)
        u1, u2 = draw2(cam_draw)
        if lens_draws:
            l1, l2 = draw2(cam_draw + jnp.uint32(1))
        else:
            # Reference-mode cameras ignore the lens-disk draws; slots are
            # absolute, so skipping slot 1 shifts nothing (one threefry
            # per sample saved across all lanes).
            l1 = l2 = jnp.zeros(shape, jnp.float32)
        return ray_gen(ix, iy, u1, u2, l1, l2)

    o0, d0 = camera_ray(jnp.zeros(shape, jnp.int32))

    # Carried state (bool masks carried as int32 for Mosaic):
    #   s: per-lane current sample index;  b: per-lane bounce index
    def cond(carry):
        alive_i = carry[6]
        return jnp.any(alive_i > 0)

    def body(carry):
        if nee:
            o, d, atten, rad, s, b, alive_i, segs, pd = carry
        else:
            o, d, atten, rad, s, b, alive_i, segs = carry
            pd = None
        alive = alive_i > 0
        segs = segs + alive_i.astype(jnp.float32)
        sink_parts = []  # ablation dup outputs, folded * kill_f at the end

        # Winner-record rows (defined up front for the merged-fetch sweep):
        # beyond cx/cy/cz/r — always carried for the hit normal — only
        # rows the present material families consume are fetched. The
        # material type rides the sign bits of albedo_r/fuzz (see
        # _pack_mat_bits), and a scene-uniform dielectric IOR becomes the
        # static_ior constant: no type row, and usually no IOR row.
        zero = jnp.zeros(shape, jnp.float32)
        ones = jnp.ones(shape, jnp.float32)
        # Emissive (4) rides the albedo rows too (scene/compile.py).
        need_albedo = (
            (1 in material_set) or (2 in material_set) or (4 in material_set)
        )
        rec_rows = []
        rec_inits = []
        if need_albedo:
            rec_rows += [4, 5, 6]
            rec_inits += [zero, zero, zero]
        if (2 in material_set) or len(material_set) >= 3:
            # Metal needs the fuzz VALUE; any >=3-family set needs the
            # fuzz SIGN (b1, the type index's high bit — see the decode
            # below). Without it a (1,3,4) scene's light would decode as
            # Lambertian.
            rec_rows += [7]
            rec_inits += [zero]
        if (3 in material_set) and static_ior is None:
            rec_rows += [8]
            rec_inits += [ones]
        if texture_set:
            # Texture record: albedo2 (odd/unused color) + scale, with the
            # texture-type index in the sign bits of rows 9/12 (the
            # _pack_mat_bits idiom). Statically absent on untextured
            # scenes — their sweep carry is unchanged.
            rec_rows += [9, 10, 11, 12]
            rec_inits += [zero, zero, zero, zero]
        merged = MERGED_FETCH
        # Triangle-table row holding the same quantity as sphere row k:
        tri_row_of = {
            4: 9, 5: 10, 6: 11, 7: 12, 8: 13,
            9: 14, 10: 15, 11: 16, 12: 17,  # texture rows
        }

        # --- closest hit: scalar-sphere sweep with running min ------------
        # With MERGED_FETCH the sweep carry also holds the provisional
        # winner's record, updated on every `better` lane: selects apply in
        # sweep order, so the last improvement leaves exactly the final
        # winner's data — the separate fetch pass (measured ~30% of frame
        # time by tools/ablate.py) disappears.
        def run_hit(o, d, t_init=None):
            def sphere_cand(si, with_record):
                """Clamped candidate t (invalid → t_max) + winner-record
                scalars for sphere ``si`` — independent of the sweep carry,
                so W candidates can compute in parallel (SWEEP_WIDTH)."""
                cx = sread(0, si)
                cy = sread(1, si)
                cz = sread(2, si)
                r_ = sread(3, si)
                rsq = r_ * r_  # scalar; same IEEE product the compiler stores
                ocx = o.x - cx
                ocy = o.y - cy
                ocz = o.z - cz
                b_ = ocx * d.x + ocy * d.y + ocz * d.z
                c_ = ocx * ocx + ocy * ocy + ocz * ocz - rsq
                disc = b_ * b_ - c_
                if SQRT_RSQRT:
                    # Diagnostic form (KernelConfig.SQRT_RSQRT): disc<=0
                    # still yields NaN (rsqrt(neg)=NaN; 0*inf=NaN), so
                    # misses reject identically; hit t's differ in ulps.
                    sq = disc * jax.lax.rsqrt(disc)
                elif SQRT_GUARD:
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                else:
                    # sqrt(disc<0) = NaN; every comparison on a NaN t below
                    # is false, so `valid` is false exactly as with the
                    # guard — identical winners, ~3 fewer ops.
                    sq = jnp.sqrt(disc)
                t1 = -b_ - sq
                t2 = -b_ + sq
                if WINDOW_FUSE:
                    # t1 >= t_max ⇒ t2 >= t_max, which t_cand < t_best
                    # rejects later (t_best <= t_max always), so the near
                    # root needs only the lower-bound test; likewise the
                    # upper bound is subsumed by the t_best compare.
                    t_cand = jnp.where(t1 >= t_minf, t1, t2)
                    ok = t_cand >= t_minf
                    if SQRT_GUARD:
                        # With the guard, disc<0 yields finite t1=t2=-b
                        # (not NaN), so the miss must be rejected
                        # explicitly here too.
                        ok = ok & (disc >= 0.0)
                    t_cand = jnp.where(ok, t_cand, t_maxf)
                else:
                    t1_ok = (t1 >= t_minf) & (t1 < t_maxf)
                    t_cand = jnp.where(t1_ok, t1, t2)
                    valid = (t_cand >= t_minf) & (t_cand < t_maxf)
                    if SQRT_GUARD:
                        valid = (disc >= 0.0) & valid
                    t_cand = jnp.where(valid, t_cand, t_maxf)
                if not with_record:
                    return t_cand, ()
                # cx/cy/cz/r reuse the scalars the quadratic already read.
                return t_cand, (
                    cx, cy, cz, r_, *(sread(k, si) for k in rec_rows)
                )

            n_rec = 4 + len(rec_rows)

            # LANE_GATE experiment: the chunk gates set this cell to their
            # per-lane slab mask for the duration of one chunk's sweep
            # (trace-time mutation — each gate branch traces sequentially),
            # and the sweep ANDs it into `better`. None = unmasked (the
            # leaders prologue and ungated sweeps).
            lane_mask = [None]

            def hit_body(si, hc):
                t_best = hc[0]
                t_cand, vals = sphere_cand(si, merged)
                better = t_cand < t_best
                if lane_mask[0] is not None:
                    better = better & lane_mask[0]
                t_best = jnp.where(better, t_cand, t_best)
                if not merged:
                    i_best = jnp.where(better, si, hc[1])
                    return t_best, i_best
                acc = hc[1:]
                new_acc = [
                    jnp.where(better, v, prev)
                    for v, prev in zip(vals, acc[:n_rec])
                ]
                new_acc.extend(acc[n_rec:])  # tri slots pass through
                return (t_best, *new_acc)

            def tree_reduce(cands):
                """Pairwise-reduce (t, values) candidates with strict <,
                earlier candidate on the left — ties resolve to the lowest
                index, bitwise the sequential sweep's semantics. Shared by
                the sphere and triangle groups."""
                while len(cands) > 1:
                    nxt = []
                    for i in range(0, len(cands) - 1, 2):
                        (ta, va), (tb, vb) = cands[i], cands[i + 1]
                        pick = tb < ta
                        nxt.append((
                            jnp.where(pick, tb, ta),
                            tuple(
                                jnp.where(pick, y, x)
                                for x, y in zip(va, vb)
                            ),
                        ))
                    if len(cands) % 2:
                        nxt.append(cands[-1])
                    cands = nxt
                return cands[0]

            def make_runners(body_fn, group_fn):
                """Span (unrolled) and fori drivers over one primitive
                kind, tree-combining SWEEP_WIDTH candidates per carry
                merge in merged mode."""

                def span(start, count, hc):
                    if merged and SWEEP_WIDTH > 1:
                        i = start
                        while i < start + count:
                            w = min(SWEEP_WIDTH, start + count - i)
                            hc = group_fn(range(i, i + w), hc)
                            i += w
                        return hc
                    for si in range(start, start + count):
                        hc = body_fn(si, hc)
                    return hc

                def fori(start, count, hc):
                    w = SWEEP_WIDTH
                    if merged and w > 1 and count % w == 0:
                        return jax.lax.fori_loop(
                            0, count // w,
                            lambda g, hc: group_fn(
                                [start + g * w + j for j in range(w)], hc
                            ),
                            hc,
                        )
                    return jax.lax.fori_loop(
                        start, start + count, body_fn, hc
                    )

                return span, fori

            def hit_group(si_list, hc):
                """Tree-combined sweep step over a group of spheres."""
                t_g, v_g = tree_reduce(
                    [sphere_cand(si, True) for si in si_list]
                )
                t_best = hc[0]
                better = t_g < t_best
                if lane_mask[0] is not None:
                    better = better & lane_mask[0]
                new = [jnp.where(better, t_g, t_best)]
                new.extend(
                    jnp.where(better, v, prev)
                    for v, prev in zip(v_g, hc[1:1 + n_rec])
                )
                new.extend(hc[1 + n_rec:])
                return tuple(new)

            run_span, run_fori = make_runners(hit_body, hit_group)

            # Slab test shared by the sphere- and triangle-chunk gates
            # (unused pieces DCE away on ungated scenes).
            eps = jnp.float32(1e-4)
            tiny = jnp.float32(1e-30)
            ivx = 1.0 / jnp.where(jnp.abs(d.x) < tiny, tiny, d.x)
            ivy = 1.0 / jnp.where(jnp.abs(d.y) < tiny, tiny, d.y)
            ivz = 1.0 / jnp.where(jnp.abs(d.z) < tiny, tiny, d.z)

            def slab_enter(ref, c, t_best):
                """Any live lane's ray enters box c of ``ref`` before its
                current closest hit (conservative: eps-padded)."""
                tx0 = (ref[0, c] - eps - o.x) * ivx
                tx1 = (ref[3, c] + eps - o.x) * ivx
                ty0 = (ref[1, c] - eps - o.y) * ivy
                ty1 = (ref[4, c] + eps - o.y) * ivy
                tz0 = (ref[2, c] - eps - o.z) * ivz
                tz1 = (ref[5, c] + eps - o.z) * ivz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), t_minf),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), t_best),
                )
                return alive & (tn <= tf)

            t_best0 = (
                jnp.full(shape, t_maxf, jnp.float32)
                if t_init is None else t_init
            )
            izero = jnp.zeros(shape, jnp.int32)
            if merged:
                # carry: t_best, winner record (center, r, material rows),
                # and for tri scenes e1/e2 (geometric normal) + a
                # winner-is-tri flag.
                hc0 = (
                    t_best0, zero, zero, zero, ones, *rec_inits,
                    *([zero] * 6 + [izero] if n_tris else []),
                )
            else:
                hc0 = (t_best0, jnp.full(shape, -1, jnp.int32))
            if n_spheres <= UNROLL_MAX:
                hc = run_span(0, n_spheres, hc0)
            elif not cull:
                hc = run_fori(0, n_spheres, hc0)
            else:
                # Chunked sweep with per-chunk AABB culling: a slab test per
                # lane against the chunk bounds; the 16-sphere sweep runs only
                # when any live lane's ray can enter the box before its current
                # closest hit. Conservative (AABBs padded by eps), so results
                # match the plain sweep bit-for-bit.
                n_chunks = (n_spheres - LEADERS) // CULL_CHUNK

                def chunk_sweep(c, hc):
                    enter = slab_enter(aabb_ref, c, hc[0])

                    def sweep():
                        base = LEADERS + c * CULL_CHUNK
                        if LANE_GATE:
                            lane_mask[0] = enter
                        try:
                            if n_spheres <= UNROLL_TOTAL_MAX:
                                return run_span(base, CULL_CHUNK, hc)
                            return run_fori(base, CULL_CHUNK, hc)
                        finally:
                            lane_mask[0] = None

                    return jax.lax.cond(jnp.any(enter), sweep, lambda: hc)

                def chunk_sweep_dyn(c, hc):
                    # fori-body variant: c is a tracer (dynamic SMEM
                    # indexing of bounds + tables), for chunk counts past
                    # CHUNK_UNROLL_MAX where unrolled gates would blow up
                    # compile time.
                    enter = slab_enter(aabb_ref, c, hc[0])

                    def sweep(hc=hc, c=c):
                        if LANE_GATE:
                            lane_mask[0] = enter
                        try:
                            return run_fori(
                                jnp.int32(LEADERS) + c * jnp.int32(CULL_CHUNK),
                                CULL_CHUNK, hc,
                            )
                        finally:
                            lane_mask[0] = None

                    return jax.lax.cond(
                        jnp.any(enter), sweep, lambda hc=hc: hc
                    )

                dyn_gates = n_chunks > cfg.CHUNK_UNROLL_MAX
                # Leaders (the scene's largest spheres, hoisted up front by
                # compile_scene) sweep unconditionally — their size would
                # make any chunk AABB containing them always-entered.
                hc = run_span(0, LEADERS, hc0)
                if n_chunks >= SUPER_MIN and dyn_gates:
                    # Dynamic two-level gating: fori over superchunks,
                    # inner fori over each super's chunks.
                    def super_body(sc, hc):
                        enter_s = slab_enter(saabb_ref, sc, hc[0])

                        def ssweep(hc=hc, sc=sc):
                            return jax.lax.fori_loop(
                                sc * jnp.int32(SUPER),
                                jnp.minimum(
                                    (sc + 1) * jnp.int32(SUPER),
                                    jnp.int32(n_chunks),
                                ),
                                chunk_sweep_dyn, hc,
                            )

                        return jax.lax.cond(
                            jnp.any(enter_s), ssweep, lambda hc=hc: hc
                        )

                    hc = jax.lax.fori_loop(
                        0, -(-n_chunks // SUPER), super_body, hc
                    )
                elif n_chunks >= SUPER_MIN:
                    # Two-level gating (implicit BVH over the Morton order):
                    # one outer gate per SUPER chunks skips the whole
                    # group's slab tests + any() reductions.
                    for sc in range(-(-n_chunks // SUPER)):
                        enter_s = slab_enter(saabb_ref, sc, hc[0])

                        def ssweep(hc=hc, sc=sc):
                            out = hc
                            for c in range(
                                sc * SUPER, min((sc + 1) * SUPER, n_chunks)
                            ):
                                out = chunk_sweep(c, out)
                            return out

                        hc = jax.lax.cond(
                            jnp.any(enter_s), ssweep, lambda hc=hc: hc
                        )
                elif dyn_gates:
                    hc = jax.lax.fori_loop(0, n_chunks, chunk_sweep_dyn, hc)
                else:
                    for c in range(n_chunks):
                        hc = chunk_sweep(c, hc)
            # --- triangle sweep (Möller-Trumbore, two-sided); winners are
            # encoded as i_best = n_spheres + ti ---------------------------------
            if n_tris:
                def tri_cand(ti, with_record):
                    """Clamped candidate t + winner-record values for
                    triangle ``ti`` (Möller-Trumbore, two-sided) —
                    carry-independent, so groups tree-combine."""
                    v0x = tread(0, ti)
                    v0y = tread(1, ti)
                    v0z = tread(2, ti)
                    e1x = tread(3, ti)
                    e1y = tread(4, ti)
                    e1z = tread(5, ti)
                    e2x = tread(6, ti)
                    e2y = tread(7, ti)
                    e2z = tread(8, ti)
                    px = d.y * e2z - d.z * e2y
                    py = d.z * e2x - d.x * e2z
                    pz = d.x * e2y - d.y * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = 1.0 / jnp.where(jnp.abs(det) < TRI_DET_EPS, 1.0, det)
                    tvx = o.x - v0x
                    tvy = o.y - v0y
                    tvz = o.z - v0z
                    u = (tvx * px + tvy * py + tvz * pz) * inv_det
                    qx = tvy * e1z - tvz * e1y
                    qy = tvz * e1x - tvx * e1z
                    qz = tvx * e1y - tvy * e1x
                    v = (d.x * qx + d.y * qy + d.z * qz) * inv_det
                    t_cand = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    valid = (
                        (jnp.abs(det) >= TRI_DET_EPS)
                        & (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (t_cand >= t_minf)
                    )
                    if not WINDOW_FUSE:
                        # The upper bound is subsumed by t_cand < t_best
                        # (see WINDOW_FUSE) — only kept for A/B runs.
                        valid = valid & (t_cand < t_maxf)
                    t_cand = jnp.where(valid, t_cand, t_maxf)
                    if not with_record:
                        return t_cand, ()
                    # Record values + e1/e2 (the geometric normal source);
                    # cx/cy/cz/r carry slots are NOT touched by triangle
                    # winners (normal is overridden; r stays finite).
                    return t_cand, (
                        *(tread(tri_row_of[k], ti) for k in rec_rows),
                        e1x, e1y, e1z, e2x, e2y, e2z,
                    )

                def tri_apply(better, t_g, v_g, hc):
                    """Merge a winning triangle candidate into the carry."""
                    acc = list(hc[1:])
                    new_t = jnp.where(better, t_g, hc[0])
                    for pos in range(len(rec_rows)):
                        acc[4 + pos] = jnp.where(better, v_g[pos], acc[4 + pos])
                    for j in range(6):
                        acc[n_rec + j] = jnp.where(
                            better, v_g[len(rec_rows) + j], acc[n_rec + j]
                        )
                    # Spheres sweep strictly before triangles, so once any
                    # triangle improves the hit, the final winner is a
                    # triangle: OR of tri betters == winner-is-tri.
                    acc[n_rec + 6] = jnp.where(better, 1, acc[n_rec + 6])
                    return (new_t, *acc)

                def tri_body(ti, hc):
                    t_cand, vals = tri_cand(ti, merged)
                    better = t_cand < hc[0]
                    if not merged:
                        t_best = jnp.where(better, t_cand, hc[0])
                        i_best = jnp.where(better, n_spheres + ti, hc[1])
                        return t_best, i_best
                    return tri_apply(better, t_cand, vals, hc)

                def tri_group(ti_list, hc):
                    """Tree-combined sweep step over a triangle group."""
                    t_g, v_g = tree_reduce(
                        [tri_cand(ti, True) for ti in ti_list]
                    )
                    return tri_apply(t_g < hc[0], t_g, v_g, hc)

                run_tri_span, run_tri_fori = make_runners(tri_body, tri_group)

                if n_tris <= UNROLL_MAX:
                    hc = run_tri_span(0, n_tris, hc)
                else:
                    # Chunked sweep gated by chunk AABBs (same scheme as
                    # the sphere culling; Morton-sorted triangles), with
                    # the same two-level superchunk gating at scale.
                    tn_chunks = n_tris // TRI_CHUNK

                    def tri_chunk_sweep(c, hc):
                        enter = slab_enter(traabb_ref, c, hc[0])

                        def tsweep(hc=hc, c=c):
                            if n_tris <= UNROLL_TOTAL_MAX:
                                return run_tri_span(c * TRI_CHUNK, TRI_CHUNK, hc)
                            return run_tri_fori(c * TRI_CHUNK, TRI_CHUNK, hc)

                        return jax.lax.cond(
                            jnp.any(enter), tsweep, lambda hc=hc: hc
                        )

                    def tri_chunk_sweep_dyn(c, hc):
                        enter = slab_enter(traabb_ref, c, hc[0])

                        def tsweep(hc=hc, c=c):
                            return run_tri_fori(
                                c * jnp.int32(TRI_CHUNK), TRI_CHUNK, hc
                            )

                        return jax.lax.cond(
                            jnp.any(enter), tsweep, lambda hc=hc: hc
                        )

                    tdyn = tn_chunks > cfg.CHUNK_UNROLL_MAX
                    if tn_chunks >= SUPER_MIN and tdyn:
                        def tsuper_body(sc, hc):
                            enter_s = slab_enter(tsaabb_ref, sc, hc[0])

                            def tssweep(hc=hc, sc=sc):
                                return jax.lax.fori_loop(
                                    sc * jnp.int32(SUPER),
                                    jnp.minimum(
                                        (sc + 1) * jnp.int32(SUPER),
                                        jnp.int32(tn_chunks),
                                    ),
                                    tri_chunk_sweep_dyn, hc,
                                )

                            return jax.lax.cond(
                                jnp.any(enter_s), tssweep, lambda hc=hc: hc
                            )

                        hc = jax.lax.fori_loop(
                            0, -(-tn_chunks // SUPER), tsuper_body, hc
                        )
                    elif tn_chunks >= SUPER_MIN:
                        for sc in range(-(-tn_chunks // SUPER)):
                            enter_s = slab_enter(tsaabb_ref, sc, hc[0])

                            def tssweep(hc=hc, sc=sc):
                                out = hc
                                for c in range(
                                    sc * SUPER,
                                    min((sc + 1) * SUPER, tn_chunks),
                                ):
                                    out = tri_chunk_sweep(c, out)
                                return out

                            hc = jax.lax.cond(
                                jnp.any(enter_s), tssweep, lambda hc=hc: hc
                            )
                    elif tdyn:
                        hc = jax.lax.fori_loop(
                            0, tn_chunks, tri_chunk_sweep_dyn, hc
                        )
                    else:
                        for c in range(tn_chunks):
                            hc = tri_chunk_sweep(c, hc)
            return hc

        hres = run_hit(o, d)
        if "hit" in abl:
            h2 = run_hit(V3(o.x + kill_f, o.y, o.z), d)
            for a2 in h2:
                sink_parts.append(
                    a2 if a2.dtype == jnp.float32 else a2.astype(jnp.float32)
                )
        t_best = hres[0]
        i_best = None if merged else hres[1]
        hit_mask = t_best < t_maxf

        if "gates" in abl and cull:
            # Slab test + any() + lax.cond per chunk, with trivial branch
            # bodies: isolates the per-chunk gate overhead from the sweeps.
            eps_g = jnp.float32(1e-4)
            tiny_g = jnp.float32(1e-30)
            dxg = d.x + kill_f
            gvx = 1.0 / jnp.where(jnp.abs(dxg) < tiny_g, tiny_g, dxg)
            gvy = 1.0 / jnp.where(jnp.abs(d.y) < tiny_g, tiny_g, d.y)
            gvz = 1.0 / jnp.where(jnp.abs(d.z) < tiny_g, tiny_g, d.z)
            gacc = segs * kill_f
            for c in range((n_spheres - LEADERS) // CULL_CHUNK):
                tx0 = (aabb_ref[0, c] - eps_g - o.x) * gvx
                tx1 = (aabb_ref[3, c] + eps_g - o.x) * gvx
                ty0 = (aabb_ref[1, c] - eps_g - o.y) * gvy
                ty1 = (aabb_ref[4, c] + eps_g - o.y) * gvy
                tz0 = (aabb_ref[2, c] - eps_g - o.z) * gvz
                tz1 = (aabb_ref[5, c] + eps_g - o.z) * gvz
                tng = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), t_minf),
                )
                tfg = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), t_maxf),
                )
                enter_g = alive & (tng <= tfg)
                gacc = jax.lax.cond(
                    jnp.any(enter_g),
                    lambda gacc=gacc: gacc + 1.0,
                    lambda gacc=gacc: gacc,
                )
            sink_parts.append(gacc)

        # --- fetch the winner's record by masked select sweep -------------
        # (Only in non-merged mode; with MERGED_FETCH the hit sweep above
        # already carried the winner's record.)
        def run_fetch(i_best):
            frows = [0, 1, 2, 3] + rec_rows
            finits = (zero, zero, zero, ones, *rec_inits)

            def fetch_body(si, fc):
                sel = i_best == si
                return tuple(
                    jnp.where(sel, sread(k, si), prev)
                    for k, prev in zip(frows, fc)
                )

            if n_spheres <= UNROLL_MAX:
                fc = finits
                for si in range(n_spheres):
                    fc = fetch_body(si, fc)
                fetched = fc
            elif not cull:
                fetched = jax.lax.fori_loop(0, n_spheres, fetch_body, finits)
            else:
                # Winners cluster in few chunks; fetch only chunks that own
                # one. Leaders fetch unconditionally (they match the hit
                # sweep's ungated prologue).
                if GATED_FETCH:
                    fc = finits
                    for si in range(LEADERS):
                        fc = fetch_body(si, fc)
                    for c in range((n_spheres - LEADERS) // CULL_CHUNK):
                        base = LEADERS + c * CULL_CHUNK
                        owns = jnp.any(
                            (i_best >= base) & (i_best < base + CULL_CHUNK)
                        )

                        def fetch_chunk(fc=fc, base=base):
                            if n_spheres <= UNROLL_TOTAL_MAX:
                                out = fc
                                for k in range(CULL_CHUNK):
                                    out = fetch_body(base + k, out)
                                return out
                            return jax.lax.fori_loop(
                                base, base + CULL_CHUNK, fetch_body, fc
                            )

                        fc = jax.lax.cond(owns, fetch_chunk, lambda fc=fc: fc)
                    fetched = fc
                else:
                    fetched = jax.lax.fori_loop(0, n_spheres, fetch_body, finits)
            return fetched

        if merged:
            cxw, cyw, czw, rw = hres[1], hres[2], hres[3], hres[4]
            recs = list(hres[5:5 + len(rec_rows)])
        else:
            fetched = run_fetch(i_best)
            if "fetch" in abl:
                f2 = run_fetch(i_best + kill_i)
                for a2 in f2:
                    sink_parts.append(a2)
            cxw, cyw, czw, rw = fetched[0], fetched[1], fetched[2], fetched[3]
            recs = list(fetched[4:])

        point = o + d * t_best
        # 1/r is the correctly-rounded divide — bit-identical to the scene
        # compiler's inv_radius (no-hit lanes carry r=1, keeping it finite).
        normal = (point - V3(cxw, cyw, czw)) * (1.0 / rw)
        if n_tris and merged:
            # Triangle winners already overrode the record in the sweep;
            # only the geometric normal from the carried e1/e2 remains.
            (te1x, te1y, te1z, te2x, te2y, te2z, tri_flag) = (
                hres[5 + len(rec_rows):]
            )
            is_tri = tri_flag > 0
            gn = V3(te1x, te1y, te1z).cross(V3(te2x, te2y, te2z))
            gn_inv = jax.lax.rsqrt(jnp.maximum(gn.length_sq(), jnp.float32(1e-30)))
            normal = V3.where(is_tri, gn * gn_inv, normal)
        if n_tris and not merged:
            # Triangle winners override the sphere record (still packed).
            def tri_fetch(ti, fc):
                sel = i_best == (n_spheres + ti)
                new_e = tuple(
                    jnp.where(sel, tread(3 + j, ti), v)
                    for j, v in enumerate(fc[:6])
                )
                new_r = tuple(
                    jnp.where(sel, tread(tri_row_of[k], ti), v)
                    for k, v in zip(rec_rows, fc[6:])
                )
                return (*new_e, *new_r)

            tfc = (zero, zero, zero, zero, zero, zero, *recs)
            if n_tris <= UNROLL_MAX:
                for ti in range(n_tris):
                    tfc = tri_fetch(ti, tfc)
            else:
                # Winners cluster: fetch only chunks that own one.
                for c in range(n_tris // TRI_CHUNK):
                    base = n_spheres + c * TRI_CHUNK
                    owns = jnp.any(
                        (i_best >= base) & (i_best < base + TRI_CHUNK)
                    )

                    def tfetch_chunk(tfc=tfc, c=c):
                        if n_tris <= UNROLL_TOTAL_MAX:
                            out = tfc
                            for k in range(TRI_CHUNK):
                                out = tri_fetch(c * TRI_CHUNK + k, out)
                            return out
                        return jax.lax.fori_loop(
                            c * TRI_CHUNK, (c + 1) * TRI_CHUNK, tri_fetch, tfc
                        )

                    tfc = jax.lax.cond(owns, tfetch_chunk, lambda tfc=tfc: tfc)
            (te1x, te1y, te1z, te2x, te2y, te2z) = tfc[:6]
            recs = list(tfc[6:])

            is_tri = i_best >= n_spheres
            gn = V3(te1x, te1y, te1z).cross(V3(te2x, te2y, te2z))
            gn_inv = jax.lax.rsqrt(jnp.maximum(gn.length_sq(), jnp.float32(1e-30)))
            normal = V3.where(is_tri, gn * gn_inv, normal)

        # --- decode the packed record (see _pack_mat_bits) -----------------
        recd = dict(zip(rec_rows, recs))
        arp = recd.get(4, zero)
        ay = recd.get(5, zero)
        az = recd.get(6, zero)
        fzp = recd.get(7, zero)
        if (3 in material_set) and static_ior is None:
            io = recd[8]
        elif 3 in material_set:
            io = zero + jnp.float32(static_ior)
        else:
            io = ones
        ms = sorted(material_set)
        if len(ms) == 1:
            ax, fz = arp, fzp
            mt = jnp.full(shape, ms[0], jnp.int32)
        else:
            b0 = (
                jax.lax.bitcast_convert_type(arp, jnp.uint32)
                >> jnp.uint32(31)
            ).astype(jnp.int32)
            ax = jnp.abs(arp)
            if len(ms) == 2:
                fz = fzp
                mt = jnp.where(b0 == 1, jnp.int32(ms[1]), jnp.int32(ms[0]))
            else:
                b1 = (
                    jax.lax.bitcast_convert_type(fzp, jnp.uint32)
                    >> jnp.uint32(31)
                ).astype(jnp.int32)
                fz = jnp.abs(fzp)
                hi = (
                    jnp.where(b0 == 1, jnp.int32(ms[3]), jnp.int32(ms[2]))
                    if len(ms) == 4 else jnp.int32(ms[2])
                )
                mt = jnp.where(
                    b1 == 1, hi,
                    jnp.where(b0 == 1, jnp.int32(ms[1]), jnp.int32(ms[0])),
                )
        front = normal.dot(d) <= 0.0
        normal = V3.where(front, normal, -normal)
        if texture_set:
            # Texture record decode — the mat-decode scheme on rows 9/12.
            a2rp, a2y, a2z, tscp = recd[9], recd[10], recd[11], recd[12]
            tids = _tex_ids(texture_set)
            t0 = (
                jax.lax.bitcast_convert_type(a2rp, jnp.uint32)
                >> jnp.uint32(31)
            ).astype(jnp.int32)
            a2x = jnp.abs(a2rp)
            if len(tids) == 2:
                tsc = tscp  # bit 1 unused → scale row never sign-flipped
                tex = jnp.where(
                    t0 == 1, jnp.int32(tids[1]), jnp.int32(tids[0])
                )
            else:
                t1 = (
                    jax.lax.bitcast_convert_type(tscp, jnp.uint32)
                    >> jnp.uint32(31)
                ).astype(jnp.int32)
                tsc = jnp.abs(tscp)
                tex = jnp.where(
                    t1 == 1, jnp.int32(tids[2]),
                    jnp.where(t0 == 1, jnp.int32(tids[1]), jnp.int32(tids[0])),
                )
            tex_fields = dict(
                tex_ty=tex, albedo2=V3(a2x, a2y, a2z), tex_scale=tsc,
            )
        else:
            tex_fields = {}
        hit = Hit(
            # In merged mode the winner index is never materialized (the
            # record rides the sweep carry); scatter does not consume idx.
            t=t_best, idx=(jnp.zeros(shape, jnp.int32) if merged else i_best),
            mask=hit_mask, point=point, normal=normal,
            front_face=front, mat_ty=mt, albedo=V3(ax, ay, az), fuzz=fz, ior=io,
            **tex_fields,
        )
        # Procedural albedo at the hit point (statically pruned when the
        # scene is untextured) — the same shared evaluation the oracle
        # applies (render/textures.py), so the paths stay bitwise equal.
        hit = apply_texture(hit, texture_set or None)

        # --- miss → sky, retire (shader.wgsl:343-345) ---------------------
        miss = alive & ~hit_mask
        if sky is None:
            skyv = color_sky(d.y)
        else:
            # Constant background (World.ambient) — baked in.
            skyv = V3(
                zero + jnp.float32(sky[0]),
                zero + jnp.float32(sky[1]),
                zero + jnp.float32(sky[2]),
            )
        zero3 = V3(zero, zero, zero)
        rad = rad + V3.where(miss, atten * skyv, zero3)
        alive = alive & hit_mask

        # --- emissive hit → throughput * emission, retire (extension;
        # emission rides the winner record's albedo slots) ------------------
        if 4 in material_set:
            is_light = alive & (mt == jnp.int32(4))
            if nee:
                # MIS pickup: a lane whose last vertex was diffuse
                # (pd = scatter cosine > 0) weights emission by the
                # balance heuristic against the light sampler's density
                # for the direction it traced (render/lights.py); specular
                # chains keep full pickup.
                from myraytracer_tpu.render.lights import light_pdf_at_hit

                piq = light_pdf_at_hit(nee_lights, o, d, hit.t)
                w_mis = jnp.where(
                    pd > 0.0,
                    pd / jnp.maximum(pd + piq, 1e-12),
                    jnp.float32(1.0),
                )
                rad = rad + V3.where(
                    is_light, atten * hit.albedo * w_mis, zero3
                )
            else:
                rad = rad + V3.where(is_light, atten * hit.albedo, zero3)
            alive = alive & ~is_light

        # --- scatter (same draw slots as the oracle) ----------------------
        sample_id = sample_start + s.astype(jnp.uint32)
        if depth > crng.MAX_DEPTH:
            # Deep-depth draw pages (crng.depth_page_key): per-lane page
            # from the bounce counter, scatter/NEE/RR draws under the
            # page key at the local slot window — same math as the
            # oracle, so deep frames stay bitwise across backends. The
            # hw-PRNG scatter path has no slot budget (draw2 ignores the
            # slot), but its threefry RR stream still pages (unused page
            # values are DCE'd when rr is off).
            page = (b // jnp.int32(crng.BOUNCES_PER_PAGE)).astype(jnp.uint32)
            local_b = b - (page * jnp.uint32(crng.BOUNCES_PER_PAGE)).astype(
                jnp.int32
            )
            bkey = crng.depth_page_key(key, page)
            brr_key = crng.fold_key(bkey, crng.RR_KEY_FOLD) if rr else None
            if rng_mode == "hw":
                draw2b = draw2
            else:

                def draw2b(draw_slot, _k=bkey):
                    return crng.uniform2(_k, lane_id, draw_slot)
        else:
            local_b, brr_key, draw2b = b, rr_key, draw2
        draw = (
            sample_id * jnp.uint32(crng.DRAWS_PER_SAMPLE)
            + jnp.uint32(crng.CAMERA_DRAWS)
            + local_b.astype(jnp.uint32) * jnp.uint32(crng.DRAWS_PER_BOUNCE)
        )
        # Draw slots are absolute, so skipping a family's draws never
        # shifts the rest of the stream (parity with the oracle holds).
        need_ball = 2 in material_set
        need_ud = (3 in material_set) or nee
        if 1 in material_set:
            us1, us2 = draw2b(draw)
            sphere_sample = crng.unit_sphere_from_uniforms(us1, us2)
        else:
            sphere_sample = zero3
        if need_ball:
            ub1, ub2 = draw2b(draw + jnp.uint32(1))
        if need_ball or need_ud:
            ub3, ud = draw2b(draw + jnp.uint32(2))
        else:
            ud = zero
        ball_sample = (
            crng.unit_ball_from_uniforms(ub1, ub2, ub3) if need_ball else zero3
        )

        if "rng" in abl:
            # Three extra draw2 calls (the per-bounce scatter draw budget)
            # at distinct slots: the threefry cost, data-independent.
            for off in (101, 102, 103):
                ra, rb = draw2b(draw + jnp.uint32(off))
                sink_parts.append(ra)
                sink_parts.append(rb)
        if "samplers" in abl:
            if 1 in material_set:
                ss2 = crng.unit_sphere_from_uniforms(us1 + kill_f, us2)
                sink_parts.extend([ss2.x, ss2.y, ss2.z])
            if need_ball:
                bs2 = crng.unit_ball_from_uniforms(ub1 + kill_f, ub2, ub3)
                sink_parts.extend([bs2.x, bs2.y, bs2.z])

        is_lamb_hit = alive & (mt == jnp.int32(1))
        if nee:
            from myraytracer_tpu.render.lights import (
                SHADOW_EPS, sample_lights,
            )

            n1, n2 = draw2b(draw + jnp.uint32(3))
            omega, t_p, contrib, ok_s = sample_lights(
                nee_lights, hit.point, hit.normal, ud, n1, n2
            )
            # Shadow sweep: run_hit initialized at the light distance —
            # t_best < limit afterwards iff the closest hit in [t_min,
            # limit) exists, the oracle's occlusion predicate exactly.
            limit = t_p * jnp.float32(1.0 - SHADOW_EPS)
            sh = run_hit(hit.point, omega, t_init=limit)
            lit = ~(sh[0] < limit)
            add = is_lamb_hit & ok_s & lit
            rad = rad + V3.where(add, atten * hit.albedo * contrib, zero3)
            segs = segs + is_lamb_hit.astype(jnp.float32)  # shadow rays
        sc = scatter(d, hit, sphere_sample, ball_sample, ud, material_set)
        if "scatter" in abl:
            sc2 = scatter(
                d, hit._replace(fuzz=hit.fuzz + kill_f),
                sphere_sample, ball_sample, ud, material_set,
            )
            sink_parts.extend([
                sc2.ok.astype(jnp.float32),
                sc2.direction.x, sc2.direction.y, sc2.direction.z,
                sc2.attenuation.x, sc2.attenuation.y, sc2.attenuation.z,
            ])
        alive = alive & sc.ok  # absorbed → retire black (shader.wgsl:349-350)

        atten = V3.where(alive, atten * sc.attenuation, atten)
        o = V3.where(alive, hit.point, o)
        unit_z = V3(zero, zero, zero + 1.0)
        nd = V3.where(alive, sc.direction, unit_z).normalize()
        d = V3.where(alive, nd, d)
        if nee:
            # Cosine of the diffuse scatter (pdf = cos/pi): the MIS
            # pickup weight's BSDF side at the next hit — same expression
            # as the oracle, so the paths stay value-identical.
            pd = jnp.where(
                alive & is_lamb_hit,
                jnp.maximum(d.dot(hit.normal), 0.0),
                jnp.float32(0.0),
            )

        # Depth exhaustion → black contribution (shader.wgsl:357).
        b = jnp.where(alive, b + 1, b)
        alive = alive & (b < depth)
        if rr:
            # Russian roulette before tracing bounce b (>= rr): kill with
            # probability 1-p, divide survivors' throughput by p — same
            # expressions as the oracle (value-identical paths). Killed
            # lanes fall straight into the regeneration below.
            do_rr = alive & (b >= jnp.int32(rr))
            u_rr, _ = crng.uniform2(brr_key, lane_id, draw)
            p_rr = jnp.clip(
                jnp.maximum(atten.x, jnp.maximum(atten.y, atten.z)),
                0.05, 0.95,
            )
            alive = alive & ~(do_rr & (u_rr >= p_rr))
            atten = V3.where(do_rr & alive, atten * (1.0 / p_rr), atten)

        # --- path regeneration: dead lanes start their next sample --------
        # (Immediate regeneration; holding dead lanes for phase-aligned
        # "waves" measured 15-20% slower — idle lanes cost more than the
        # frustum coherence they buy.)
        regen = (~alive) & (s + 1 < n_valid_i) & in_image
        if multi:
            # Flush the finished sample's radiance into its frame bucket
            # (bucket = s // spp), then reset the per-sample radiance.
            # Branchless: every bucket takes a masked add each iteration —
            # ~12 vreg ops per bucket. (A pl.when gate per bucket measured
            # ~50x slower: each branch in the while body pays carry
            # save/restore traffic that dwarfs the masked update.)
            sdiv = s // jnp.int32(spp)
            fzero = jnp.zeros(shape, jnp.float32)
            for k in range(frames):
                m = regen & (sdiv == jnp.int32(k))
                sc_r[k] = sc_r[k] + jnp.where(m, rad.x, fzero)
                sc_g[k] = sc_g[k] + jnp.where(m, rad.y, fzero)
                sc_b[k] = sc_b[k] + jnp.where(m, rad.z, fzero)
            rad = V3.where(regen, V3(fzero, fzero, fzero), rad)
        s = jnp.where(regen, s + 1, s)
        no, nd2 = camera_ray(s)
        if "regen" in abl:
            ro2, rd2 = camera_ray(s + kill_i)
            sink_parts.extend([ro2.x, ro2.y, ro2.z, rd2.x, rd2.y, rd2.z])
        o = V3.where(regen, no, o)
        d = V3.where(regen, nd2, d)
        one = zero + 1.0
        atten = V3.where(regen, V3(one, one, one), atten)
        b = jnp.where(regen, 0, b)
        alive_i = (alive | regen).astype(jnp.int32)
        if sink_parts:
            acc = sink_parts[0]
            for p in sink_parts[1:]:
                acc = acc + p
            segs = segs + acc * kill_f
        if nee:
            # Fresh sample, fresh pickup weight.
            pd = jnp.where(regen, jnp.float32(0.0), pd)
            return (o, d, atten, rad, s, b, alive_i, segs, pd)
        return (o, d, atten, rad, s, b, alive_i, segs)

    zero = jnp.zeros(shape, jnp.float32)
    active0 = in_image & (n_valid_i > 0)
    init = (
        o0,
        d0,
        V3.ones(shape),
        V3.zeros(shape),
        jnp.zeros(shape, jnp.int32),  # s
        jnp.zeros(shape, jnp.int32),  # b
        active0.astype(jnp.int32),
        zero,  # segs
    )
    if nee:
        init = init + (jnp.zeros(shape, jnp.float32),)  # prev-diffuse cos (MIS)
    out = jax.lax.while_loop(cond, body, init)
    rad, segs = out[3], out[7]

    w = in_image.astype(jnp.float32)
    if multi:
        # Every in-image lane ends holding its LAST sample's radiance
        # (the final sample has no regeneration to flush it); it belongs
        # to the last bucket. Out-of-image lanes never accumulate.
        sc_r[frames - 1] = sc_r[frames - 1] + rad.x * w
        sc_g[frames - 1] = sc_g[frames - 1] + rad.y * w
        sc_b[frames - 1] = sc_b[frames - 1] + rad.z * w
        r_ref[...] = sc_r[...]
        g_ref[...] = sc_g[...]
        b_ref[...] = sc_b[...]
    else:
        r_ref[...] = rad.x * w
        g_ref[...] = rad.y * w
        b_ref[...] = rad.z * w
    segs_ref[...] = segs * w


def _prepare_scene_operands(
    scene: CompiledScene, material_set, kc: KernelConfig, kernel,
    use_packed_cam: bool, default_cam, texture_set=(),
):
    """Per-call scene-operand packing shared by the uniform and adaptive
    renderers: table placement (SMEM scalar prefetch vs VMEM), prefetch
    array construction, runtime-camera selection, and the kernel partial
    specialized to the scene's static facts.

    Returns ``(prefetch_ops, extra_in, extra_specs, kern)`` where
    ``prefetch_ops`` is the 7-tuple ``(sf_smem, aabb, saabb, trf_smem,
    traabb, tsaabb, camf)`` (callers append meta/row0/... after it),
    ``extra_in``/``extra_specs`` carry the optional VMEM tables, and
    ``kern`` is the kernel with scene-shape kwargs bound.
    """
    n_t = scene.tris.v0.x.shape[0] if scene.has_triangles else 0
    textured = bool(texture_set)
    # Triangle-table placement: SMEM (scalar prefetch, fastest) while
    # the whole prefetch set fits; else the 14/18-row table moves to
    # VMEM (no practical size cap) and only its AABB gate tables stay
    # in SMEM. KernelConfig.TRI_VMEM forces either way.
    tri_vmem = kc.TRI_VMEM
    if tri_vmem is None:
        tri_vmem = bool(n_t) and not fits_in_smem(
            scene.padded_size, n_t, kc, textured=textured
        )
    sph_vmem = kc.SPH_VMEM
    if sph_vmem is None:
        sph_vmem = not fits_in_smem(
            scene.padded_size, n_t, kc, tri_table_in_smem=not tri_vmem,
            textured=textured,
        )
    if not fits_in_smem(scene.padded_size, n_t, kc,
                        tri_table_in_smem=not tri_vmem,
                        sph_table_in_smem=not sph_vmem,
                        textured=textured):
        raise ValueError(
            f"scene's AABB gate tables alone exceed the SMEM budget "
            f"(~{estimated_prefetch_bytes(scene.padded_size, n_t, kc, not tri_vmem, not sph_vmem, textured)} "
            f"bytes of {SMEM_BUDGET}): {scene.padded_size} spheres + "
            f"{n_t} triangles. Use the jnp backend for scenes this "
            f"large."
        )
    sf, aabb, saabb, trf, traabb, tsaabb = _scene_to_prefetch(
        scene, material_set, kc, texture_set
    )
    if use_packed_cam and scene.cam is not None:
        camf = jnp.asarray(scene.cam, jnp.float32)
    else:
        camf = default_cam
    n_spheres = int(sf.shape[1])
    n_tris = int(trf.shape[1]) if scene.has_triangles else 0
    extra_in = ()
    extra_specs = []
    if tri_vmem:
        # VMEM table layout is [T, 14]: the dynamic triangle index
        # must ride the SUBLANE dim (Mosaic rejects dynamic lane
        # indices). The 14-wide lane dim pads to 128 under tiling
        # (~9x bloat: 512 B/triangle of VMEM — ~190k triangles in a
        # ~100 MB budget, 12x the SMEM cap). Pads are degenerate
        # (zero-edge) triangles.
        tpad = (-trf.shape[1]) % 8
        trf_vmem_arr = jnp.pad(trf, ((0, 0), (0, tpad))).T
        trf_smem = jnp.zeros((tri_table_rows(textured), 1), jnp.float32)
    else:
        trf_smem = trf
    if sph_vmem:
        # Same scheme for the sphere table ([N, 9|13]); VMEM pad rows
        # are never swept (sweep counts stop at n_spheres).
        spad = (-sf.shape[1]) % 8
        sf_vmem_arr = jnp.pad(sf, ((0, 0), (0, spad))).T
        sf_smem = jnp.zeros((sph_table_rows(textured), 1), jnp.float32)
        extra_in += (sf_vmem_arr,)
        extra_specs.append(pl.BlockSpec(
            sf_vmem_arr.shape, lambda t, *_: (0, 0),
            memory_space=pltpu.VMEM,
        ))
    else:
        sf_smem = sf
    if tri_vmem:
        extra_in += (trf_vmem_arr,)
        extra_specs.append(pl.BlockSpec(
            trf_vmem_arr.shape, lambda t, *_: (0, 0),
            memory_space=pltpu.VMEM,
        ))
    kern = functools.partial(
        kernel, n_spheres=n_spheres, n_tris=n_tris,
        cull=(kc.FORCE_CULL if kc.FORCE_CULL is not None
              else n_spheres > kc.CULL_MIN),
        tri_vmem=tri_vmem, sph_vmem=sph_vmem,
    )
    return (
        (sf_smem, aabb, saabb, trf_smem, traabb, tsaabb, camf),
        extra_in, extra_specs, kern,
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
    sample_batch: int = 0,  # unused: lanes regenerate through samples
    tile_rows: int = DEFAULT_TILE_ROWS,
    interpret: bool = False,
    material_set=None,
    rng_mode: str = "threefry",
    static_ior=None,
    config: KernelConfig = None,
    frames: int = 1,
    sky=None,
    nee_lights=None,
    texture_set=None,
    qmc: bool = False,
    rr: int = 0,
):
    """Pallas implementation of the block-renderer protocol.

    Same contract as ``render.integrator.make_block_renderer``:
    ``block(scene, key, row0, sample_start, n_valid) -> (radiance_sum
    [n_rows, width, 3], segments f32)``.

    ``static_ior``: when every dielectric in the scene shares one index of
    refraction, pass it here — the kernel bakes it in and drops the IOR
    row from the winner-record sweep (one fewer SMEM read + select +
    carried array per sweep step). Exact: the constant is the same f32.

    ``frames > 1`` renders that many progressive frames of ``max_samples``
    samples each in ONE kernel call (callers must pass
    ``n_valid = frames * max_samples``); the radiance sum becomes
    ``[frames, 3, n_rows, width]`` (channels-first — a trailing 3 would
    pad to 128 under TPU tiling). Each frame is bitwise identical to a
    separate single-frame call, but the whole window shares one in-kernel
    regeneration tail — the small-spp progressive fix (BENCH.md).
    """
    del sample_batch
    nee_lights = tuple(nee_lights) if nee_lights else None
    frames = int(frames)
    spp_static = int(max_samples) if max_samples else 0
    if frames > 1 and spp_static < 1:
        raise ValueError("frames > 1 requires a positive max_samples (spp)")
    kc = config or DEFAULT_CONFIG
    BLOCK_W = kc.BLOCK_W
    if static_ior is not None:
        static_ior = float(static_ior)
    if sky is not None:
        sky = tuple(float(c) for c in sky)
    if material_set is None:
        material_set = (1, 2, 3)
    material_set = tuple(sorted(set(material_set)))
    texture_set = tuple(sorted(set(texture_set))) if texture_set else ()
    if 3 in texture_set:  # api.TEXTURE_IMAGE
        raise NotImplementedError(
            "image textures need a per-lane bitmap gather, which Mosaic "
            "has no vector instruction for (and the one-hot MXU gather "
            "costs more than the whole bounce — BENCH.md 'Image "
            "textures'); render image-textured scenes on the jnp "
            "integrator (backend=auto falls back automatically)"
        )
    # Reference-mode camera is fixed by contract (shader.wgsl:360-361) and
    # stays baked in; the general thin-lens camera is read from the packed
    # SMEM operand so camera motion re-uses the compiled kernel (the
    # default operand reproduces the construction camera bit-for-bit).
    if cam.reference_mode or kc.STATIC_CAM:
        static_gen = cam_mod.make_ray_generator(cam, width, height)
        ray_gen_factory = lambda ref: static_gen  # noqa: E731
        default_cam = jnp.zeros((1,), jnp.float32)  # dummy operand
    else:
        ray_gen_factory = lambda ref: (  # noqa: E731
            lambda ix, iy, u1, u2, l1, l2: cam_mod.rays_from_packed(
                ref, width, height, ix, iy, u1, u2, l1, l2
            )
        )
        default_cam = jnp.asarray(cam_mod.pack_camera(cam, width, height))

    tile_size = tile_rows * LANES
    block_h = tile_size // BLOCK_W
    blocks_x = -(-width // BLOCK_W)
    blocks_y = -(-n_rows // block_h)
    n_tiles = blocks_x * blocks_y
    out_rows = n_tiles * tile_rows

    kernel = functools.partial(
        _trace_kernel,
        material_set=material_set,
        texture_set=texture_set,
        rng_mode=rng_mode,
        width=width,
        n_rows=n_rows,
        depth=int(ray_depth),
        t_min=float(t_min),
        t_max=float(t_max),
        tile_rows=tile_rows,
        ray_gen_factory=ray_gen_factory,
        static_ior=static_ior,
        cfg=kc,
        frames=frames,
        spp=spp_static,
        sky=sky,
        lens_draws=not cam.reference_mode,
        nee_lights=nee_lights,
        qmc=qmc,
        rr=int(rr),
    )

    def block(scene: CompiledScene, key, row0, sample_start, n_valid):
        prefetch_ops, extra_in, extra_specs, kern = _prepare_scene_operands(
            scene, material_set, kc, kernel,
            use_packed_cam=not (cam.reference_mode or kc.STATIC_CAM),
            default_cam=default_cam, texture_set=texture_set,
        )

        meta = jnp.stack(
            [
                jnp.asarray(key[0], jnp.uint32),
                jnp.asarray(key[1], jnp.uint32),
                jnp.asarray(sample_start, jnp.uint32),
                jnp.asarray(n_valid, jnp.uint32),
            ]
        )
        row0_arr = jnp.asarray(row0, jnp.uint32).reshape(1)

        seg_spec = pl.BlockSpec(
            (tile_rows, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        )
        if frames > 1:
            img_spec = pl.BlockSpec(
                (frames, tile_rows, LANES),
                lambda t, *_: (0, t, 0),
                memory_space=pltpu.VMEM,
            )
            img_shape = jax.ShapeDtypeStruct(
                (frames, out_rows, LANES), jnp.float32
            )
            scratch = [pltpu.VMEM((frames, tile_rows, LANES), jnp.float32)] * 3
        else:
            img_spec = seg_spec
            img_shape = jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32)
            scratch = []
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(n_tiles,),
            in_specs=extra_specs,
            out_specs=[img_spec] * 3 + [seg_spec],
            scratch_shapes=scratch,
        )

        r, g, b, segs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[img_shape] * 3
            + [jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32)],
            interpret=interpret,
        )(*prefetch_ops, meta, row0_arr, *extra_in)

        def unscramble(a):
            # Output rows are tile-major and each tile's tile_rows×128
            # lanes are a row-major block_h×BLOCK_W pixel block, with tiles
            # row-major over the padded block grid — the inverse map is a
            # pure reshape/transpose (a 960k-element gather here measured
            # ~hundreds of ms *per call* on TPU, the dominant fixed cost
            # of small-spp frames).
            lead = a.shape[:-2]
            a = a.reshape(*lead, blocks_y, blocks_x, block_h, BLOCK_W)
            a = a.transpose(
                *range(len(lead)),
                len(lead), len(lead) + 2, len(lead) + 1, len(lead) + 3,
            )
            a = a.reshape(*lead, blocks_y * block_h, blocks_x * BLOCK_W)
            return a[..., :n_rows, :width]

        # Multi-frame stacks channels FIRST: a [K,H,W,3] device array tiles
        # T(8,128) over its last two dims, padding the trailing 3 to 128 —
        # 42x the memory (31 GB at K=64, 1200x800: compile-time OOM).
        img_sum = jnp.stack(
            [unscramble(r), unscramble(g), unscramble(b)],
            axis=(1 if frames > 1 else -1),
        )
        return img_sum, jnp.sum(segs)

    return block


def make_adaptive_renderer(
    cam: Camera,
    width: int,
    height: int,
    n_sel: int,
    max_samples: int,
    ray_depth: int,
    t_min: float = 1e-3,
    t_max: float = 1e4,
    tile_rows: int = DEFAULT_TILE_ROWS,
    interpret: bool = False,
    material_set=None,
    rng_mode: str = "threefry",
    static_ior=None,
    config: KernelConfig = None,
    sky=None,
    nee_lights=None,
    texture_set=None,
    qmc: bool = False,
    rr: int = 0,
    windows: int = 1,
):
    """Adaptive-sampling block renderer (render/adaptive.py's device path).

    Returns ``render(scene, key, block_ids, samp0) -> (block_sums
    [n_sel, block_h, BLOCK_W, 3] f32, segments f32 scalar)``: one kernel
    call renders the ``n_sel`` chosen pixel blocks, each over its own
    per-pixel sample window ``[samp0[i], samp0[i] + max_samples)``. The
    block list and cursors are scalar-prefetch operands, so every round
    of an adaptive session reuses one compiled kernel. ``block_ids`` may
    contain the sentinel ``blocks_x * blocks_y`` for padding (renders
    nothing). Same RNG contract as the uniform kernel: per-pixel sample
    streams are scheduling-independent, so each block's sums are bitwise
    what the uniform kernel produces at the same per-pixel counts
    (tests/test_adaptive.py).
    """
    nee_lights = tuple(nee_lights) if nee_lights else None
    spp = int(max_samples)
    windows = int(windows)
    if spp < 1 or windows < 1:
        raise ValueError("adaptive rendering requires positive spp/windows")
    kc = config or DEFAULT_CONFIG
    BLOCK_W = kc.BLOCK_W
    if static_ior is not None:
        static_ior = float(static_ior)
    if sky is not None:
        sky = tuple(float(c) for c in sky)
    if material_set is None:
        material_set = (1, 2, 3)
    material_set = tuple(sorted(set(material_set)))
    texture_set = tuple(sorted(set(texture_set))) if texture_set else ()
    if 3 in texture_set:  # api.TEXTURE_IMAGE
        raise NotImplementedError(
            "image textures need a per-lane bitmap gather, which Mosaic "
            "has no vector instruction for (and the one-hot MXU gather "
            "costs more than the whole bounce — BENCH.md 'Image "
            "textures'); render image-textured scenes on the jnp "
            "integrator (backend=auto falls back automatically)"
        )
    if cam.reference_mode or kc.STATIC_CAM:
        static_gen = cam_mod.make_ray_generator(cam, width, height)
        ray_gen_factory = lambda ref: static_gen  # noqa: E731
        default_cam = jnp.zeros((1,), jnp.float32)
    else:
        ray_gen_factory = lambda ref: (  # noqa: E731
            lambda ix, iy, u1, u2, l1, l2: cam_mod.rays_from_packed(
                ref, width, height, ix, iy, u1, u2, l1, l2
            )
        )
        default_cam = jnp.asarray(cam_mod.pack_camera(cam, width, height))

    tile_size = tile_rows * LANES
    block_h = tile_size // BLOCK_W
    n_sel = int(n_sel)
    out_rows = n_sel * tile_rows

    kernel = functools.partial(
        _trace_kernel,
        material_set=material_set,
        texture_set=texture_set,
        rng_mode=rng_mode,
        width=width,
        n_rows=height,  # blocks address the full image (row0 = 0)
        depth=int(ray_depth),
        t_min=float(t_min),
        t_max=float(t_max),
        tile_rows=tile_rows,
        ray_gen_factory=ray_gen_factory,
        static_ior=static_ior,
        cfg=kc,
        # windows > 1 reuses the multi-frame bucket machinery: one kernel
        # call renders `windows` consecutive spp-sample sub-windows per
        # block, sharing ONE regeneration tail (the uniform frame-batching
        # win applied to adaptive rounds) while the per-window sums keep
        # the variance statistics at single-window resolution.
        frames=windows,
        spp=spp,
        sky=sky,
        lens_draws=not cam.reference_mode,
        nee_lights=nee_lights,
        adaptive=True,
        qmc=qmc,
        rr=int(rr),
    )

    def render(scene: CompiledScene, key, block_ids, samp0):
        prefetch_ops, extra_in, extra_specs, kern = _prepare_scene_operands(
            scene, material_set, kc, kernel,
            use_packed_cam=not (cam.reference_mode or kc.STATIC_CAM),
            default_cam=default_cam, texture_set=texture_set,
        )
        meta = jnp.stack(
            [
                jnp.asarray(key[0], jnp.uint32),
                jnp.asarray(key[1], jnp.uint32),
                jnp.uint32(0),  # sample_start comes from samp0 per tile
                jnp.uint32(spp * windows),
            ]
        )
        row0_arr = jnp.zeros((1,), jnp.uint32)
        bid_arr = jnp.asarray(block_ids, jnp.uint32).reshape(n_sel)
        samp0_arr = jnp.asarray(samp0, jnp.uint32).reshape(n_sel)

        seg_spec = pl.BlockSpec(
            (tile_rows, LANES), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        )
        if windows > 1:
            img_spec = pl.BlockSpec(
                (windows, tile_rows, LANES),
                lambda t, *_: (0, t, 0),
                memory_space=pltpu.VMEM,
            )
            img_shape = jax.ShapeDtypeStruct(
                (windows, out_rows, LANES), jnp.float32
            )
            scratch = [
                pltpu.VMEM((windows, tile_rows, LANES), jnp.float32)
            ] * 3
        else:
            img_spec = seg_spec
            img_shape = jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32)
            scratch = []
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=11,
            grid=(n_sel,),
            in_specs=extra_specs,
            out_specs=[img_spec] * 3 + [seg_spec],
            scratch_shapes=scratch,
        )
        r, g, b, segs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[img_shape] * 3
            + [jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32)],
            interpret=interpret,
        )(*prefetch_ops, meta, row0_arr, bid_arr, samp0_arr, *extra_in)

        # Each tile's [tile_rows, 128] lanes are one row-major
        # block_h x BLOCK_W pixel block; no gather needed. windows > 1
        # returns per-sub-window sums, leading axis first.
        if windows > 1:
            sums = jnp.stack(
                [
                    a.reshape(windows, n_sel, block_h, BLOCK_W)
                    for a in (r, g, b)
                ],
                axis=-1,
            )
        else:
            sums = jnp.stack(
                [
                    a.reshape(n_sel, block_h, BLOCK_W)
                    for a in (r, g, b)
                ],
                axis=-1,
            )
        return sums, jnp.sum(segs)

    return render


def make_renderer(
    cam: Camera,
    width: int,
    height: int,
    samples_per_frame: int,
    ray_depth: int,
    t_min: float = 1e-3,
    t_max: float = 1e4,
    sample_batch: int = 0,
    tile_rows: int = DEFAULT_TILE_ROWS,
    interpret: bool = False,
    material_set=None,
    rng_mode: str = "threefry",
    static_ior=None,
    config: KernelConfig = None,
    frames: int = 1,
    sky=None,
    nee_lights=None,
    texture_set=None,
    qmc: bool = False,
    rr: int = 0,
):
    """Jitted single-device frame renderer on the Pallas megakernel.

    Contract matches ``render.integrator.make_renderer``. With
    ``frames=K > 1`` the render returns K per-frame mean images
    ``[K, 3, H, W]`` from one kernel call (see ``make_block_renderer``).
    """
    spp = int(samples_per_frame)
    frames = int(frames)
    block = make_block_renderer(
        cam, width, height, height, spp, ray_depth,
        t_min=t_min, t_max=t_max, tile_rows=tile_rows, interpret=interpret,
        material_set=material_set, rng_mode=rng_mode, static_ior=static_ior,
        config=config, frames=frames, sky=sky, nee_lights=nee_lights,
        texture_set=texture_set, qmc=qmc, rr=rr,
    )

    @jax.jit
    def render(scene: CompiledScene, key, sample_base):
        img_sum, segs = block(
            scene, key, jnp.uint32(0), jnp.asarray(sample_base, jnp.uint32),
            jnp.uint32(frames * spp),
        )
        return img_sum * jnp.float32(1.0 / spp), segs

    return render
