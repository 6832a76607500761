"""Large-mesh scaling benchmark (run on the TPU).

Measures megakernel throughput on mesh_scene at growing triangle counts
(20·4^n icosphere + props), with the two-level superchunk gating on vs
off — the scaling story for the kernel's implicit-BVH culling
(kernels/trace.py: chunk AABBs under SUPER-wide outer gates, all in
SMEM, no gathers).

Usage: python tools/meshscale.py
Env:   MS_SUBDIVS (comma list, default "2,3,4"), MS_SPP (8), MS_WH
       (480x270), MS_REPS (2), MS_DEPTH (20)
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.kernels import trace
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import mesh_scene

    subdivs = [int(s) for s in os.environ.get("MS_SUBDIVS", "2,3,4").split(",")]
    spp = int(os.environ.get("MS_SPP", "8"))
    depth = int(os.environ.get("MS_DEPTH", "20"))
    reps = int(os.environ.get("MS_REPS", "2"))
    wh = os.environ.get("MS_WH", "480x270")
    width, height = (int(x) for x in wh.split("x"))
    key = crng.key_from_seed(0)

    print(f"{width}x{height} spp={spp} depth={depth}", flush=True)
    for sub in subdivs:
        world = mesh_scene(subdivisions=sub)
        n_tris = world.triangle_count
        if not trace.fits_in_smem(len(world.spheres) + 64, n_tris,
                                  tri_table_in_smem=False):
            print(
                f"subdiv={sub} tris={n_tris}  exceeds the SMEM prefetch "
                f"budget even with the triangle table in VMEM — "
                f"jnp/BVH territory",
                flush=True,
            )
            continue
        if not trace.fits_in_smem(len(world.spheres) + 64, n_tris):
            print(f"subdiv={sub} tris={n_tris}: triangle table in VMEM "
                  f"(past the SMEM prefetch cap)", flush=True)
        scene = compile_scene(world, spatial_sort=True)
        mats = tuple(sorted({m.material.type_id for m in world.meshes}))
        row = [f"subdiv={sub} tris={n_tris}"]
        # Build both variants first, then time them interleaved: the TPU
        # drifts between performance phases over minutes, so sequential
        # per-variant timing is unreliable (see tools/sweep.py).
        built = []
        base_img = None
        for label, super_min in (("super", None), ("flat", 10 ** 9)):
            config = (trace.KernelConfig() if super_min is None
                      else trace.KernelConfig(SUPER_MIN=super_min))
            render = trace.make_renderer(
                world.camera, width, height, spp, depth,
                material_set=mats, static_ior=1.5, config=config,
            )
            t0 = time.perf_counter()
            img, segs = render(scene, key, 0)
            img_np = np.asarray(img)
            compile_s = time.perf_counter() - t0
            if base_img is None:
                base_img = img_np
            elif not np.array_equal(img_np, base_img):
                row.append(f"!! {label} image differs")
            built.append((label, render, float(np.asarray(segs)), compile_s))
        times = {label: [] for label, *_ in built}
        for r in range(reps):
            order = built if r % 2 == 0 else list(reversed(built))
            for label, render, _, _ in order:
                t0 = time.perf_counter()
                img, _ = render(scene, key, 0)
                np.asarray(img)
                times[label].append(time.perf_counter() - t0)
        for label, render, segs_f, compile_s in built:
            ts = sorted(times[label])
            med = ts[len(ts) // 2]
            row.append(
                f"{label}: {med * 1e3:7.1f} ms {segs_f / med / 1e6:6.1f} "
                f"Mrays/s (compile {compile_s:.0f}s)"
            )
        print("  ".join(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
