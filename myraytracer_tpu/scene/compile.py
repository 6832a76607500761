"""Scene compiler: API World → SoA device arrays.

The reference flattens its AoS scene into SoA pools packed in 1-D textures
with base-index range tables (``raytracer/src/lib.rs:722-863``) because its
WebGL2 floor forbids storage buffers. On TPU the constraint is different:
the hit loop wants each per-sphere quantity as a contiguous f32/i32 vector
in HBM/VMEM, and the per-hit material fetch wants *one* gather, not an
indirection through per-type pools. So the compiler **denormalizes**:
every sphere row carries its own material parameters (albedo, fuzz, ior)
alongside its geometry, and the per-type pool layout of the reference
survives only as ``compile_reference_layout`` (kept for parity testing of
the flattening semantics).

Padding: sphere arrays are padded to a lane multiple with ``radius_sq = -1``
slots. For a normalized ray direction, Cauchy-Schwarz gives
``b^2 = (oc·d)^2 <= |oc|^2``, so the discriminant ``b^2 - (|oc|^2 - r^2)``
of a pad slot is ``<= -1``: pad slots can *never* hit, with zero masking
cost in the hot loop.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from myraytracer_tpu.core.vec import V3
from myraytracer_tpu.scene import api

# Lane-friendly padding; Pallas kernels assume sphere vectors are a
# multiple of this.
SPHERE_PAD = 8


class CompiledTriangleBVH(NamedTuple):
    """Flat skip-link BVH over the (reordered) triangle arrays.

    Built host-side by the native C++ binned-SAH builder
    (native/src/bvh.cpp; Python fallback myraytracer_tpu/native/bvh_py.py).
    Traversal contract: node i descends to i+1 on a bbox hit (or tests its
    leaf range), else jumps to skip[i]; done when the cursor reaches M.
    """

    lo: V3  # [M] each
    hi: V3
    first: jnp.ndarray  # [M] i32
    count: jnp.ndarray  # [M] i32 (0 = interior)
    skip: jnp.ndarray  # [M] i32


BVH_MAX_LEAF = 4


class CompiledTriangles(NamedTuple):
    """SoA triangle arrays; padding slots have zero edges (degenerate →
    Möller-Trumbore determinant 0 → can never hit)."""

    v0: V3  # [T] each
    e1: V3  # v1 - v0
    e2: V3  # v2 - v0
    albedo: V3
    fuzz: jnp.ndarray
    ior: jnp.ndarray
    mat_ty: jnp.ndarray  # i32
    bvh: Optional[CompiledTriangleBVH] = None
    # Procedural-texture rows (None on untextured scenes; see CompiledScene).
    tex_ty: Optional[jnp.ndarray] = None  # [T] i32
    albedo2: Optional[V3] = None  # [T] each (checker ODD color)
    tex_scale: Optional[jnp.ndarray] = None  # [T] f32

    @property
    def padded_size(self) -> int:
        return self.fuzz.shape[0]


class CompiledScene(NamedTuple):
    """SoA scene arrays; a pytree of same-length-N device arrays.

    ``radius`` is signed (negative radius = inward normals, matching the
    reference's ``(at - center) / radius`` at shader.wgsl:299);
    ``radius_sq`` is what the quadratic uses, and is -1 on padding slots.
    """

    center: V3  # [N] each
    radius: jnp.ndarray  # [N] f32, signed
    radius_sq: jnp.ndarray  # [N] f32, -1 marks padding
    albedo: V3  # [N] each (Lambertian/Metal albedo; 0 otherwise)
    fuzz: jnp.ndarray  # [N] f32 (Metal fuzz; 0 otherwise)
    ior: jnp.ndarray  # [N] f32 (Dielectric index; 1 otherwise)
    mat_ty: jnp.ndarray  # [N] i32 (0 pad, 1 lambertian, 2 metal, 3 dielectric)
    tris: Optional[CompiledTriangles] = None
    # Optional packed runtime camera ([19] f32, render.camera.pack_camera):
    # when set, the Pallas kernel reads the thin-lens basis from it at run
    # time instead of the renderer's construction-time camera — camera
    # motion then needs no recompile (same compiled kernel, new operand).
    cam: Optional[jnp.ndarray] = None
    # Procedural-texture rows (extension; render/textures.py). None on
    # untextured scenes — the pytree structure then matches pre-texture
    # scenes exactly, so untextured renders compile to identical code.
    # ``albedo`` doubles as the solid / checker-EVEN / marble base color;
    # ``albedo2`` is the checker ODD color; ``tex_scale`` the frequency.
    tex_ty: Optional[jnp.ndarray] = None  # [N] i32 (api.TEXTURE_*)
    albedo2: Optional[V3] = None  # [N] each
    tex_scale: Optional[jnp.ndarray] = None  # [N] f32
    # Bitmap for TEXTURE_IMAGE lanes ([TH, TW, 3] f32; None unless the
    # scene uses an api.ImageTexture — one image per scene, its tiling
    # factor rides tex_scale). Evaluated by the jnp integrator's XLA
    # gather; the Pallas megakernel rejects image-textured scenes
    # (backend=auto falls back — render/dispatch.py).
    tex_image: Optional[jnp.ndarray] = None

    @property
    def padded_size(self) -> int:
        return self.radius.shape[0]

    @property
    def has_triangles(self) -> bool:
        return self.tris is not None


def _pad(a: np.ndarray, n: int, fill) -> np.ndarray:
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    out[: a.shape[0]] = a
    return out


def _texture_row(m: api.Material):
    """Denormalized (tex_ty, albedo2, tex_scale) for one material.

    Solid materials get ``(TEXTURE_SOLID, (0,0,0), 0.0)``; textured
    Lambertians carry their second color and scale (the base color rides
    the ordinary albedo row — see ``_material_row``).
    """
    a = getattr(m, "albedo", None)
    if isinstance(a, api.Checker):
        return api.TEXTURE_CHECKER, a.odd, a.scale
    if isinstance(a, api.Marble):
        return api.TEXTURE_MARBLE, (0.0, 0.0, 0.0), a.scale
    if isinstance(a, api.ImageTexture):
        return api.TEXTURE_IMAGE, (0.0, 0.0, 0.0), a.scale
    return api.TEXTURE_SOLID, (0.0, 0.0, 0.0), 0.0


def _base_color(a):
    """Solid albedo, or a texture's base color (the even/band color —
    the second color and scale ride the texture rows, ``_texture_row``)."""
    if isinstance(a, api.Checker):
        return a.even
    if isinstance(a, api.Marble):
        return a.color
    if isinstance(a, api.ImageTexture):
        # The bitmap is the color; the albedo row is a white multiplier
        # (texture value replaces it at the hit — render/textures.py).
        return (1.0, 1.0, 1.0)
    return a


def _material_row(m: api.Material):
    """Denormalized (albedo, fuzz, ior, type) for one material."""
    if isinstance(m, api.Lambertian):
        return _base_color(m.albedo), 0.0, 1.0, m.type_id
    if isinstance(m, api.Metal):
        return _base_color(m.albedo), m.fuzz, 1.0, m.type_id
    if isinstance(m, api.Dielectric):
        return (0.0, 0.0, 0.0), 0.0, m.ior, m.type_id
    if isinstance(m, api.DiffuseLight):
        # Emission rides the albedo columns (lights never scatter, so
        # the slots are free); components may exceed 1 (intensity).
        return m.emit, 0.0, 1.0, m.type_id
    raise TypeError(f"unknown material: {m!r}")


# The kernel's scene-size-dependent triangle chunk widths (mirrored by
# kernels/trace.py:resolve_tri_chunk, which imports this table): kd
# partitioning aligns its triangle groups to the width the kernel will
# gate at.
TRI_CHUNK_AUTO = ((768, 64), (8192, 32), (None, 16))


def _auto_tri_chunk(n_tris: int) -> int:
    for bound, chunk in TRI_CHUNK_AUTO:
        if bound is None or n_tris <= bound:
            return chunk
    return TRI_CHUNK_AUTO[-1][1]


def _compile_triangles(
    meshes, pad_to: int, with_bvh: bool, spatial_sort: bool,
    textured: bool = False, partition: str = "morton",
) -> CompiledTriangles:
    t = sum(len(m) for m in meshes)
    tpad = max(pad_to, -(-max(t, 1) // pad_to) * pad_to)
    v0 = np.zeros((t, 3), np.float32)
    e1 = np.zeros((t, 3), np.float32)
    e2 = np.zeros((t, 3), np.float32)
    albedo = np.zeros((t, 3), np.float32)
    fuzz = np.zeros((t,), np.float32)
    ior = np.ones((t,), np.float32)
    mat_ty = np.zeros((t,), np.int32)
    tex_ty = np.zeros((t,), np.int32)
    albedo2 = np.zeros((t, 3), np.float32)
    tex_scale = np.zeros((t,), np.float32)

    k = 0
    for mesh in meshes:
        verts = np.asarray(mesh.vertices, np.float32)
        alb, fz, io, ty = _material_row(mesh.material)
        tty, a2, tsc = _texture_row(mesh.material)
        tri = np.asarray(mesh.triangles, np.int32).reshape(-1, 3)
        n_m = tri.shape[0]
        if n_m == 0:
            continue
        a = verts[tri[:, 0]]
        v0[k:k + n_m] = a
        e1[k:k + n_m] = verts[tri[:, 1]] - a
        e2[k:k + n_m] = verts[tri[:, 2]] - a
        albedo[k:k + n_m] = alb
        fuzz[k:k + n_m] = fz
        ior[k:k + n_m] = io
        mat_ty[k:k + n_m] = ty
        tex_ty[k:k + n_m] = tty
        albedo2[k:k + n_m] = a2
        tex_scale[k:k + n_m] = tsc
        k += n_m

    if spatial_sort and not with_bvh and t > 64:
        # Spatially sort triangles by centroid so the Pallas kernel's
        # chunked AABB culling gets spatial locality (ties-only semantic
        # effect, like the sphere sort). "kd" groups to the kernel's auto
        # chunk width for tighter per-chunk AABBs than the Morton curve.
        cent = v0 + (e1 + e2) / 3.0
        if partition == "kd":
            order = kd_chunk_order(cent, _auto_tri_chunk(t))
        else:
            order = morton_order(cent)
        v0, e1, e2 = v0[order], e1[order], e2[order]
        albedo, fuzz, ior, mat_ty = (
            albedo[order], fuzz[order], ior[order], mat_ty[order],
        )
        tex_ty, albedo2, tex_scale = (
            tex_ty[order], albedo2[order], tex_scale[order],
        )

    bvh = None
    if with_bvh and t > 0:
        from myraytracer_tpu.native import build_bvh

        v1 = v0 + e1
        v2 = v0 + e2
        prim_min = np.minimum(np.minimum(v0, v1), v2)
        prim_max = np.maximum(np.maximum(v0, v1), v2)
        flat = build_bvh(prim_min, prim_max, max_leaf=BVH_MAX_LEAF)
        # Reorder triangle rows so leaves reference contiguous ranges.
        perm = flat.order
        v0, e1, e2 = v0[perm], e1[perm], e2[perm]
        albedo, fuzz, ior, mat_ty = albedo[perm], fuzz[perm], ior[perm], mat_ty[perm]
        tex_ty, albedo2, tex_scale = tex_ty[perm], albedo2[perm], tex_scale[perm]
        bvh = CompiledTriangleBVH(
            lo=V3(
                jnp.asarray(flat.nodes_min[:, 0]),
                jnp.asarray(flat.nodes_min[:, 1]),
                jnp.asarray(flat.nodes_min[:, 2]),
            ),
            hi=V3(
                jnp.asarray(flat.nodes_max[:, 0]),
                jnp.asarray(flat.nodes_max[:, 1]),
                jnp.asarray(flat.nodes_max[:, 2]),
            ),
            first=jnp.asarray(flat.first),
            count=jnp.asarray(flat.count),
            skip=jnp.asarray(flat.skip),
        )

    mkv3 = lambda a: V3(
        jnp.asarray(_pad(a[:, 0], tpad, 0.0)),
        jnp.asarray(_pad(a[:, 1], tpad, 0.0)),
        jnp.asarray(_pad(a[:, 2], tpad, 0.0)),
    )
    return CompiledTriangles(
        v0=mkv3(v0),
        e1=mkv3(e1),  # zero-edge padding is degenerate → never hits
        e2=mkv3(e2),
        albedo=mkv3(albedo),
        fuzz=jnp.asarray(_pad(fuzz, tpad, 0.0)),
        ior=jnp.asarray(_pad(ior, tpad, 1.0)),
        mat_ty=jnp.asarray(_pad(mat_ty, tpad, api.MATERIAL_NONE)),
        bvh=bvh,
        tex_ty=(
            jnp.asarray(_pad(tex_ty, tpad, api.TEXTURE_SOLID))
            if textured else None
        ),
        albedo2=mkv3(albedo2) if textured else None,
        tex_scale=(
            jnp.asarray(_pad(tex_scale, tpad, 0.0)) if textured else None
        ),
    )


def _morton3(q: np.ndarray) -> np.ndarray:
    """Interleave 10-bit xyz quantized coords into a 30-bit Morton code."""

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )


def morton_order(centers: np.ndarray) -> np.ndarray:
    """Sphere permutation by Morton code of the center (stable)."""
    lo = centers.min(axis=0)
    span = np.maximum(centers.max(axis=0) - lo, 1e-12)
    q = np.clip(((centers - lo) / span * 1023.0), 0, 1023).astype(np.uint32)
    return np.argsort(_morton3(q), kind="stable")


def kd_chunk_order(centers: np.ndarray, chunk: int) -> np.ndarray:
    """Permutation grouping centers into consecutive ``chunk``-sized,
    spatially compact groups by recursive balanced longest-axis splits.

    The Pallas kernel gates each consecutive CULL_CHUNK-slot group behind
    its AABB (kernels/trace.py); a Morton curve makes those groups *local*
    but its discontinuities leave some boxes loose. A median kd split
    always partitions along the widest axis, so group AABBs are as tight
    as a balanced equal-size partition gets — fewer opened gates per
    tile-bounce for the same kernel. Split points land on multiples of
    ``chunk`` so only the final group is partial (it absorbs the pads).
    Like the Morton sort, the reorder affects only equal-t tie-breaking.
    """
    def rec(idx):
        if len(idx) <= chunk:
            return [idx]
        c = centers[idx]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = idx[np.argsort(c[:, ax], kind="stable")]
        n_groups = -(-len(idx) // chunk)
        m = (n_groups // 2) * chunk
        return rec(order[:m]) + rec(order[m:])

    return np.concatenate(rec(np.arange(len(centers))))


# Spheres hoisted to the front of the spatially-sorted order (the LEADERS
# largest by |radius|): the Pallas kernel sweeps the first LEADERS table
# slots unconditionally and applies chunk-AABB culling only to the rest,
# so one giant sphere (e.g. the RTiOW ground, radius 1000) cannot inflate
# its Morton chunk's AABB into a box every ray enters every bounce.
LEADERS = 8


def _image_texture(world: api.World):
    """The scene's single ImageTexture, or None.

    Sphere materials only (meshes carry no UVs — api.ImageTexture
    docstring), and at most one distinct image per scene (the compiled
    scene carries a single bitmap operand; no atlas).
    """
    for m in world.meshes:
        if isinstance(getattr(m.material, "albedo", None), api.ImageTexture):
            raise ValueError(
                "ImageTexture maps sphere UVs only; meshes carry no UVs"
            )
    imgs = []
    for s in world.spheres:
        a = getattr(s.material, "albedo", None)
        if isinstance(a, api.ImageTexture) and a not in imgs:
            imgs.append(a)
    if len(imgs) > 1:
        raise ValueError(
            f"one ImageTexture per scene (got {len(imgs)} distinct); "
            "pack shared maps into a single image"
        )
    return imgs[0] if imgs else None


def compile_scene(
    world: api.World,
    pad_to: int = SPHERE_PAD,
    spatial_sort: bool = False,
    triangle_bvh: bool = False,
    partition: str = "kd",
    partition_chunk: int = 48,  # = kernels.trace.CULL_CHUNK default
) -> CompiledScene:
    """Flatten an api.World into padded SoA jnp arrays.

    ``spatial_sort`` reorders spheres (and triangles past 64, unless a
    BVH reorders them instead) so that consecutive index chunks are
    spatially compact — the Pallas kernel's chunk-AABB culling
    (kernels/trace.py) depends on that locality. Reordering only affects
    equal-t tie-breaking (the reference's scan order, shader.wgsl:320,
    matters only for exact ties), so all compute paths stay
    statistically identical.

    ``partition`` selects the ordering under ``spatial_sort``: ``"kd"``
    (default since round 5: ``kd_chunk_order`` — balanced kd splits
    aligned to ``partition_chunk``-slot groups; −49% total chunk-AABB
    surface and −8/−21% measured frame time vs the curve, BENCH.md
    "Per-ray culling") or ``"morton"`` (the round-1..4 curve order,
    kept for A/B). ``partition_chunk`` should match the kernel's
    CULL_CHUNK (mismatch is correctness-safe, just loses tightness).
    """
    n = len(world.spheres)
    spheres = world.spheres
    if spatial_sort and n > 1:
        if partition not in ("morton", "kd"):
            raise ValueError(f"unknown partition {partition!r}")
        centers = np.asarray([s.center for s in spheres], np.float32)
        order = morton_order(centers)
        if n > LEADERS:
            # Hoist the LEADERS largest spheres to the front (keeping
            # Morton order within each group). Ordering affects only
            # equal-t tie-breaking, like the Morton sort itself.
            radii = np.abs(np.asarray([s.radius for s in spheres], np.float32))
            big = np.argsort(-radii[order], kind="stable")[:LEADERS]
            lead_mask = np.zeros(len(order), bool)
            lead_mask[big] = True
            order = np.concatenate([order[lead_mask], order[~lead_mask]])
            if partition == "kd":
                # Leaders keep their slots; the chunk-gated remainder is
                # regrouped for tighter per-chunk AABBs.
                rest = order[LEADERS:]
                order = np.concatenate([
                    order[:LEADERS],
                    rest[kd_chunk_order(centers[rest], partition_chunk)],
                ])
        elif partition == "kd":
            order = order[kd_chunk_order(centers[order], partition_chunk)]
        spheres = tuple(spheres[i] for i in order)
        world = api.World(spheres, camera=world.camera,
                          meshes=world.meshes, ambient=world.ambient)
    npad = max(pad_to, -(-max(n, 1) // pad_to) * pad_to)

    center = np.zeros((n, 3), np.float32)
    radius = np.zeros((n,), np.float32)
    albedo = np.zeros((n, 3), np.float32)
    fuzz = np.zeros((n,), np.float32)
    ior = np.ones((n,), np.float32)
    mat_ty = np.zeros((n,), np.int32)
    tex_ty = np.zeros((n,), np.int32)
    albedo2 = np.zeros((n, 3), np.float32)
    tex_scale = np.zeros((n,), np.float32)

    for i, s in enumerate(world.spheres):
        center[i] = s.center
        radius[i] = s.radius
        albedo[i], fuzz[i], ior[i], mat_ty[i] = _material_row(s.material)
        tex_ty[i], albedo2[i], tex_scale[i] = _texture_row(s.material)

    # Texture rows exist only on textured scenes (one global switch for
    # spheres and meshes): the untextured pytree is unchanged, so every
    # existing compile stays bitwise identical.
    textured = bool(world.texture_set)
    img_tex = _image_texture(world)

    radius_sq = radius * radius
    # Pad slots: radius_sq = -1 makes them unhittable (see module docstring).
    center_p = _pad(center, npad, 0.0)
    albedo_p = _pad(albedo, npad, 0.0)
    albedo2_p = _pad(albedo2, npad, 0.0)
    return CompiledScene(
        center=V3(
            jnp.asarray(center_p[:, 0]),
            jnp.asarray(center_p[:, 1]),
            jnp.asarray(center_p[:, 2]),
        ),
        radius=jnp.asarray(_pad(radius, npad, 1.0)),
        radius_sq=jnp.asarray(_pad(radius_sq, npad, -1.0)),
        albedo=V3(
            jnp.asarray(albedo_p[:, 0]),
            jnp.asarray(albedo_p[:, 1]),
            jnp.asarray(albedo_p[:, 2]),
        ),
        fuzz=jnp.asarray(_pad(fuzz, npad, 0.0)),
        ior=jnp.asarray(_pad(ior, npad, 1.0)),
        mat_ty=jnp.asarray(_pad(mat_ty, npad, api.MATERIAL_NONE)),
        tris=(
            _compile_triangles(
                world.meshes,
                pad_to,
                # BVH traversal is gather-bound: a win on CPU, but far
                # slower than the vectorized chunk scan on TPU at moderate
                # triangle counts — so it is opt-in (a TPU-native
                # traversal is future work).
                with_bvh=bool(triangle_bvh),
                spatial_sort=spatial_sort,
                textured=textured,
                partition=partition,
            )
            if world.meshes
            else None
        ),
        tex_ty=jnp.asarray(_pad(tex_ty, npad, api.TEXTURE_SOLID)) if textured else None,
        albedo2=V3(
            jnp.asarray(albedo2_p[:, 0]),
            jnp.asarray(albedo2_p[:, 1]),
            jnp.asarray(albedo2_p[:, 2]),
        ) if textured else None,
        tex_scale=jnp.asarray(_pad(tex_scale, npad, 0.0)) if textured else None,
        tex_image=(
            jnp.asarray(img_tex.data) if img_tex is not None else None
        ),
    )


def compile_reference_layout(world: api.World) -> Dict[str, object]:
    """Reproduce the reference's pool/range flattening semantics.

    Mirrors the behavior of ``Object::new``'s SoA packing
    (``raytracer/src/lib.rs:722-799``): spheres keep insertion order; each
    material is appended to its per-type pool in sphere order and the sphere
    records (type, index-within-pool); the three typed streams are built by
    appending ranges (sphere centers then lambertian albedos then metal
    albedos into the vec4 stream; radii then fuzzes into the f32 stream;
    material types then material indices into the i32 stream).

    Exists for parity tests and as documentation of the reference contract;
    the renderer itself consumes :func:`compile_scene`.
    """
    sphere_centers = []
    sphere_radii = []
    sphere_mat_tys = []
    sphere_mat_idxs = []
    lamb_albedos = []
    metal_albedos = []
    metal_fuzzes = []
    dielectric_iors = []

    for s in world.spheres:
        sphere_centers.append([*s.center, 1.0])  # vec4 w=1.0 like lib.rs:769
        sphere_radii.append(s.radius)
        m = s.material
        sphere_mat_tys.append(m.type_id)
        if isinstance(m, api.Lambertian):
            sphere_mat_idxs.append(len(lamb_albedos))
            # Textured albedo (extension) has no reference-layout slot;
            # its base color stands in (the reference predates textures).
            a = _material_row(m)[0]
            lamb_albedos.append([*a, 1.0])
        elif isinstance(m, api.Metal):
            sphere_mat_idxs.append(len(metal_albedos))
            metal_albedos.append([*m.albedo, 1.0])
            metal_fuzzes.append(m.fuzz)
        elif isinstance(m, api.Dielectric):
            sphere_mat_idxs.append(len(dielectric_iors))
            dielectric_iors.append(m.ior)

    vec4_f32_data = []
    f32_data = []
    i32_data = []

    def push(stream, items):
        base = len(stream)
        stream.extend(items)
        return base

    ranges = {
        "spheres": {
            "center_base_idx": push(vec4_f32_data, sphere_centers),
            "radius_base_idx": push(f32_data, sphere_radii),
            "material_ty_base_idx": push(i32_data, sphere_mat_tys),
            "material_idx_base_idx": push(i32_data, sphere_mat_idxs),
            "length": len(world.spheres),
        },
        "lambertians": {
            "albedo_base_idx": push(vec4_f32_data, lamb_albedos),
            "length": len(lamb_albedos),
        },
        "metals": {
            "albedo_base_idx": push(vec4_f32_data, metal_albedos),
            "fuzz_base_idx": push(f32_data, metal_fuzzes),
            "length": len(metal_albedos),
        },
        # Extension beyond the reference layout:
        "dielectrics": {
            "ior_base_idx": push(f32_data, dielectric_iors),
            "length": len(dielectric_iors),
        },
    }
    return {
        "world": ranges,
        "vec4_f32_data": np.asarray(vec4_f32_data, np.float32).reshape(-1, 4),
        "f32_data": np.asarray(f32_data, np.float32),
        "i32_data": np.asarray(i32_data, np.int32),
    }
