"""Batched ray-primitive closest hit.

The reference's ``world_hit`` is a per-thread linear scan with a shrinking
``t_sup`` window (``shader.wgsl:314-329``) calling ``sphere_hit``
(``shader.wgsl:270-312``). Here the scan becomes a masked min-reduction
over the primitive axis, vectorized over all ray lanes; primitives are
processed in bounded chunks via ``lax.scan`` so the pairwise
(ray × primitive) intermediate stays VMEM-sized.

Sphere semantics preserved from the reference:

* half-b quadratic with ``a = 1`` (ray directions are normalized each
  bounce, shader.wgsl:354; the reference computes ``a = dot(dir,dir)`` on
  that normalized vector, which is 1 up to rounding);
* nearer root first; the farther root is used only when the nearer one is
  outside the window (shader.wgsl:290-296);
* strict ``t < t_sup`` acceptance ⇒ the earliest primitive wins ties. The
  shrinking-window scan is equivalent to a global-window min-reduction:
  any candidate the shrinking window rejects would lose the min anyway;
* outward normal ``(at - center) / radius`` with signed radius (negative
  radius ⇒ inward normals, used for hollow glass), front-face test
  ``dot(normal, dir) <= 0`` and backface normal flip (shader.wgsl:298-307).

Triangles (extension; the reference has no triangles) use the
Möller-Trumbore test, two-sided, with the same front-face/normal-flip
convention applied to the geometric normal.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.scene.compile import CompiledScene, CompiledTriangles

TRI_DET_EPS = 1e-9


class Hit(NamedTuple):
    """Per-lane closest-hit record (analog of shader.wgsl:134-140)."""

    t: jnp.ndarray  # f32; == t_max where there is no hit
    idx: jnp.ndarray  # i32 primitive index (0 when no hit; see mask)
    mask: jnp.ndarray  # bool, True = hit something
    point: V3
    normal: V3  # flipped to oppose the ray (shader.wgsl:305-307)
    front_face: jnp.ndarray  # bool
    mat_ty: jnp.ndarray  # i32
    albedo: V3
    fuzz: jnp.ndarray
    ior: jnp.ndarray
    # Procedural-texture record (extension; None on untextured scenes —
    # render/textures.py replaces ``albedo`` at the hit point when set).
    tex_ty: jnp.ndarray = None  # i32 (api.TEXTURE_*)
    albedo2: V3 = None
    tex_scale: jnp.ndarray = None


def _chunk_size(n_prims: int, n_lanes: int) -> int:
    """Pick a chunk size bounding the [chunk, lanes] temporaries."""
    budget = 16 << 20  # ~16M f32 elements per pairwise temp (64 MB)
    c = max(8, min(n_prims, budget // max(1, n_lanes)))
    return max(8, (c // 8) * 8)


def _pad_1d(a: jnp.ndarray, pad: int, value) -> jnp.ndarray:
    return jnp.pad(a, (0, pad), constant_values=value)


def _sphere_candidates(
    o: V3, d: V3, scene: CompiledScene, t_min: float, t_max: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Running (t_best, i_best) over all spheres; t_best == t_max on miss."""
    n_lanes = o.x.shape[0]
    n = scene.padded_size
    chunk = _chunk_size(n, n_lanes)
    pad = (-n) % chunk
    cx, cy, cz = scene.center.x, scene.center.y, scene.center.z
    r_sq = scene.radius_sq
    if pad:
        cx, cy, cz = (_pad_1d(a, pad, 0.0) for a in (cx, cy, cz))
        r_sq = _pad_1d(r_sq, pad, -1.0)  # unhittable pad slots
        n += pad
    n_chunks = n // chunk
    chunked = lambda a: a.reshape(n_chunks, chunk)

    t_minf = jnp.float32(t_min)
    big = jnp.float32(t_max)

    def body(carry, xs):
        t_best, i_best, base = carry
        ccx, ccy, ccz, cr_sq = xs
        ocx = o.x[None, :] - ccx[:, None]
        ocy = o.y[None, :] - ccy[:, None]
        ocz = o.z[None, :] - ccz[:, None]
        b = ocx * d.x[None, :] + ocy * d.y[None, :] + ocz * d.z[None, :]
        c = ocx * ocx + ocy * ocy + ocz * ocz - cr_sq[:, None]
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = -b - sq
        t2 = -b + sq
        t1_ok = (t1 >= t_minf) & (t1 < big)
        t_cand = jnp.where(t1_ok, t1, t2)
        valid = (disc >= 0.0) & (t_cand >= t_minf) & (t_cand < big)
        t_cand = jnp.where(valid, t_cand, big)
        # First-index-wins min over the chunk (jnp.argmin returns first).
        t_chunk = jnp.min(t_cand, axis=0)
        i_chunk = jnp.argmin(t_cand, axis=0).astype(jnp.int32) + base
        better = t_chunk < t_best
        t_best = jnp.where(better, t_chunk, t_best)
        i_best = jnp.where(better, i_chunk, i_best)
        return (t_best, i_best, base + chunk), None

    t0 = jnp.full((n_lanes,), big, jnp.float32)
    i0 = jnp.zeros((n_lanes,), jnp.int32)
    xs = tuple(chunked(a) for a in (cx, cy, cz, r_sq))
    if n_chunks == 1:
        (t_best, i_best, _), _ = body(
            (t0, i0, jnp.int32(0)), tuple(a[0] for a in xs)
        )
    else:
        (t_best, i_best, _), _ = jax.lax.scan(body, (t0, i0, jnp.int32(0)), xs)
    return t_best, i_best


def _triangle_candidates(
    o: V3, d: V3, tris: CompiledTriangles, t_min: float, t_max: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Running (t_best, i_best) over all triangles (Möller-Trumbore,
    two-sided); t_best == t_max on miss."""
    n_lanes = o.x.shape[0]
    n = tris.padded_size
    # MT materializes ~2x the pairwise temporaries, so halve the chunk by
    # presenting twice the lanes to the budget.
    chunk = _chunk_size(n, n_lanes * 2)
    pad = (-n) % chunk
    comps = [
        tris.v0.x, tris.v0.y, tris.v0.z,
        tris.e1.x, tris.e1.y, tris.e1.z,
        tris.e2.x, tris.e2.y, tris.e2.z,
    ]
    if pad:
        comps = [_pad_1d(a, pad, 0.0) for a in comps]  # degenerate pads
        n += pad
    n_chunks = n // chunk
    chunked = lambda a: a.reshape(n_chunks, chunk)

    t_minf = jnp.float32(t_min)
    big = jnp.float32(t_max)

    def body(carry, xs):
        t_best, i_best, base = carry
        # One shared Möller-Trumbore (same code as the BVH leaf tests),
        # broadcast [chunk, 1] triangles against [1, lanes] rays.
        ob = V3(o.x[None, :], o.y[None, :], o.z[None, :])
        db = V3(d.x[None, :], d.y[None, :], d.z[None, :])
        t_cand = _mt_candidate(
            ob, db, *(a[:, None] for a in xs), t_minf, big
        )
        t_chunk = jnp.min(t_cand, axis=0)
        i_chunk = jnp.argmin(t_cand, axis=0).astype(jnp.int32) + base
        better = t_chunk < t_best
        t_best = jnp.where(better, t_chunk, t_best)
        i_best = jnp.where(better, i_chunk, i_best)
        return (t_best, i_best, base + chunk), None

    t0 = jnp.full((n_lanes,), big, jnp.float32)
    i0 = jnp.zeros((n_lanes,), jnp.int32)
    xs = tuple(chunked(a) for a in comps)
    if n_chunks == 1:
        (t_best, i_best, _), _ = body(
            (t0, i0, jnp.int32(0)), tuple(a[0] for a in xs)
        )
    else:
        (t_best, i_best, _), _ = jax.lax.scan(body, (t0, i0, jnp.int32(0)), xs)
    return t_best, i_best


def _mt_candidate(o, d, v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, t_min, t_max):
    """Möller-Trumbore candidate t for one gathered triangle per lane."""
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
        & (t_cand >= t_min)
        & (t_cand < t_max)
    )
    return jnp.where(valid, t_cand, t_max)


def _triangle_bvh_candidates(
    o: V3, d: V3, tris: CompiledTriangles, t_min: float, t_max: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane-parallel stackless skip-link BVH traversal (oracle path).

    Each lane walks the flat BVH (scene/compile.py CompiledTriangleBVH)
    with its own cursor: descend to ``node+1`` on a bbox hit (interior) or
    test the leaf's ≤ BVH_MAX_LEAF triangles, else jump to ``skip[node]``.
    Per-step node/triangle reads are gathers — acceptable for the jnp
    oracle; the closest-hit window tightens as hits are found, pruning
    subtrees behind the current best.
    """
    from myraytracer_tpu.scene.compile import BVH_MAX_LEAF

    bvh = tris.bvh
    m = int(bvh.count.shape[0])
    n_lanes = o.x.shape[0]
    t_minf = jnp.float32(t_min)
    big = jnp.float32(t_max)
    tiny = jnp.float32(1e-30)
    ivx = 1.0 / jnp.where(jnp.abs(d.x) < tiny, tiny, d.x)
    ivy = 1.0 / jnp.where(jnp.abs(d.y) < tiny, tiny, d.y)
    ivz = 1.0 / jnp.where(jnp.abs(d.z) < tiny, tiny, d.z)

    def cond(carry):
        node = carry[0]
        return jnp.any(node < m)

    def body(carry):
        node, t_best, i_best = carry
        active = node < m
        nidx = jnp.where(active, node, 0)
        take = lambda a: jnp.take(a, nidx, axis=0)
        lox, loy, loz = take(bvh.lo.x), take(bvh.lo.y), take(bvh.lo.z)
        hix, hiy, hiz = take(bvh.hi.x), take(bvh.hi.y), take(bvh.hi.z)
        first = take(bvh.first)
        count = take(bvh.count)
        skip = take(bvh.skip)

        tx0 = (lox - o.x) * ivx
        tx1 = (hix - o.x) * ivx
        ty0 = (loy - o.y) * ivy
        ty1 = (hiy - o.y) * ivy
        tz0 = (loz - o.z) * ivz
        tz1 = (hiz - o.z) * ivz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), t_minf),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), t_best),
        )
        enter = active & (tn <= tf)
        is_leaf = count > 0

        # Leaf: test up to BVH_MAX_LEAF triangles per lane (masked).
        test_leaf = enter & is_leaf
        for k in range(BVH_MAX_LEAF):
            pidx = jnp.where(test_leaf & (k < count), first + k, 0)
            tk = lambda a: jnp.take(a, pidx, axis=0)
            t_cand = _mt_candidate(
                o, d,
                tk(tris.v0.x), tk(tris.v0.y), tk(tris.v0.z),
                tk(tris.e1.x), tk(tris.e1.y), tk(tris.e1.z),
                tk(tris.e2.x), tk(tris.e2.y), tk(tris.e2.z),
                t_minf, big,
            )
            t_cand = jnp.where(test_leaf & (k < count), t_cand, big)
            better = t_cand < t_best
            t_best = jnp.where(better, t_cand, t_best)
            i_best = jnp.where(better, pidx, i_best)

        descend = enter & ~is_leaf
        node = jnp.where(active, jnp.where(descend, node + 1, skip), node)
        return node, t_best, i_best

    node0 = jnp.zeros((n_lanes,), jnp.int32)
    t0 = jnp.full((n_lanes,), big, jnp.float32)
    i0 = jnp.zeros((n_lanes,), jnp.int32)
    _, t_best, i_best = jax.lax.while_loop(cond, body, (node0, t0, i0))
    return t_best, i_best


def closest_hit(
    o: V3,
    d: V3,
    scene: CompiledScene,
    t_min: float,
    t_max: float,
) -> Hit:
    """Closest hit for normalized ray directions ``d`` over all lanes.

    Lane arrays may have any shape; computation flattens internally.
    """
    lane_shape = o.x.shape
    flat = lambda a: a.reshape(-1)
    o = V3(flat(o.x), flat(o.y), flat(o.z))
    d = V3(flat(d.x), flat(d.y), flat(d.z))
    big = jnp.float32(t_max)

    ts, is_ = _sphere_candidates(o, d, scene, t_min, t_max)

    if scene.has_triangles:
        if scene.tris.bvh is not None:
            tt, it = _triangle_bvh_candidates(o, d, scene.tris, t_min, t_max)
        else:
            tt, it = _triangle_candidates(o, d, scene.tris, t_min, t_max)
        tri_wins = tt < ts
        t_best = jnp.where(tri_wins, tt, ts)
    else:
        tri_wins = None
        t_best = ts

    mask = t_best < big
    point = o + d * t_best

    # Sphere record (one denormalized fetch — the reference's per-pool
    # indirection, lib.rs:722-799, is collapsed by the scene compiler).
    take = lambda a: jnp.take(a, is_, axis=0)
    s_center = V3(take(scene.center.x), take(scene.center.y), take(scene.center.z))
    s_normal = (point - s_center) * (1.0 / take(scene.radius))
    s_mat = take(scene.mat_ty)
    s_albedo = V3(take(scene.albedo.x), take(scene.albedo.y), take(scene.albedo.z))
    s_fuzz = take(scene.fuzz)
    s_ior = take(scene.ior)
    textured = scene.tex_ty is not None
    if textured:
        s_tex = take(scene.tex_ty)
        s_alb2 = V3(take(scene.albedo2.x), take(scene.albedo2.y), take(scene.albedo2.z))
        s_tsc = take(scene.tex_scale)
    else:
        s_tex = s_alb2 = s_tsc = None

    if scene.has_triangles:
        tr = scene.tris
        tk = lambda a: jnp.take(a, it, axis=0)
        e1 = V3(tk(tr.e1.x), tk(tr.e1.y), tk(tr.e1.z))
        e2 = V3(tk(tr.e2.x), tk(tr.e2.y), tk(tr.e2.z))
        gn = e1.cross(e2)
        # Guarded normalize: lanes that hit no triangle gather arbitrary
        # (possibly degenerate) rows; keep them NaN-free for debug_nans.
        gn_inv = jax.lax.rsqrt(jnp.maximum(gn.length_sq(), jnp.float32(1e-30)))
        t_normal = gn * gn_inv
        normal = V3.where(tri_wins, t_normal, s_normal)
        mat_ty = jnp.where(tri_wins, tk(tr.mat_ty), s_mat)
        albedo = V3.where(
            tri_wins,
            V3(tk(tr.albedo.x), tk(tr.albedo.y), tk(tr.albedo.z)),
            s_albedo,
        )
        fuzz = jnp.where(tri_wins, tk(tr.fuzz), s_fuzz)
        ior = jnp.where(tri_wins, tk(tr.ior), s_ior)
        idx = jnp.where(tri_wins, it, is_)
        if textured:
            s_tex = jnp.where(tri_wins, tk(tr.tex_ty), s_tex)
            s_alb2 = V3.where(
                tri_wins,
                V3(tk(tr.albedo2.x), tk(tr.albedo2.y), tk(tr.albedo2.z)),
                s_alb2,
            )
            s_tsc = jnp.where(tri_wins, tk(tr.tex_scale), s_tsc)
    else:
        normal, mat_ty, albedo, fuzz, ior, idx = (
            s_normal, s_mat, s_albedo, s_fuzz, s_ior, is_,
        )

    front = normal.dot(d) <= 0.0  # shader.wgsl:303
    normal = V3.where(front, normal, -normal)

    unflat = lambda a: a.reshape(lane_shape)
    unflat3 = lambda v: V3(unflat(v.x), unflat(v.y), unflat(v.z))
    return Hit(
        t=unflat(t_best),
        idx=unflat(idx),
        mask=unflat(mask),
        point=unflat3(point),
        normal=unflat3(normal),
        front_face=unflat(front),
        mat_ty=unflat(mat_ty),
        albedo=unflat3(albedo),
        fuzz=unflat(fuzz),
        ior=unflat(ior),
        tex_ty=unflat(s_tex) if textured else None,
        albedo2=unflat3(s_alb2) if textured else None,
        tex_scale=unflat(s_tsc) if textured else None,
    )
