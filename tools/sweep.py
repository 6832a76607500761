"""Kernel-config sweep on the real final scene (run on the TPU).

Measures frame time for a list of kernel-constant overrides (module
globals in kernels/trace.py), restoring defaults between runs. Used to
re-test tuning decisions after structural changes (e.g. the 7x
in-situ-vs-isolated sweep throughput gap measured by tools/ablate.py,
suspected to be register pressure around the lax.cond chunk gates).

Usage: python tools/sweep.py          (TPU; one Mosaic compile per variant)
Env:   SWEEP_SPP (32), SWEEP_REPS (3)
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

# (name, {module attr: value})
VARIANTS = [
    ("baseline", {}),
    ("ungated-fetch", {"GATED_FETCH": False}),
    ("no-cull", {"_FORCE_CULL": False}),
    ("no-cull+ungated", {"_FORCE_CULL": False, "GATED_FETCH": False}),
    ("chunk128", {"CULL_CHUNK": 128}),
    ("chunk32", {"CULL_CHUNK": 32}),
    ("tile8", {"DEFAULT_TILE_ROWS": 8}),
    # Full 486-sphere hit+fetch sweeps, fully unrolled, zero gates: the
    # "sweeps at isolated VPU throughput" hypothesis test.
    ("no-cull-unrolled", {"_FORCE_CULL": False, "UNROLL_MAX": 512}),
    ("chunk16", {"CULL_CHUNK": 16}),
    ("chunk48", {"CULL_CHUNK": 48}),
    # Winner record carried through the hit sweep; no separate fetch pass.
    ("merged", {"MERGED_FETCH": True}),
    ("merged-unrolled", {"MERGED_FETCH": True, "_FORCE_CULL": False,
                         "UNROLL_MAX": 512}),
    ("merged-chunk32", {"MERGED_FETCH": True, "CULL_CHUNK": 32}),
    ("unmerged", {"MERGED_FETCH": False}),
    ("dyn-ior", {"_NO_STATIC_IOR": True}),
    ("chunk96", {"CULL_CHUNK": 96}),
    ("tile24", {"DEFAULT_TILE_ROWS": 24}),
    ("tile32", {"DEFAULT_TILE_ROWS": 32}),
    ("tile24-chunk96", {"DEFAULT_TILE_ROWS": 24, "CULL_CHUNK": 96}),
    ("tile24-chunk128", {"DEFAULT_TILE_ROWS": 24, "CULL_CHUNK": 128}),
]


def main() -> int:
    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.kernels import trace
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import get_scene

    spp = int(os.environ.get("SWEEP_SPP", "32"))
    reps = int(os.environ.get("SWEEP_REPS", "3"))
    scene_name = os.environ.get("SWEEP_SCENE", "final")
    wh = os.environ.get("SWEEP_WH", "1200x800")
    width, height = (int(x) for x in wh.split("x"))
    only = os.environ.get("SWEEP_ONLY")
    variants = [v for v in VARIANTS if not only or v[0] in only.split(",")]

    world = get_scene(scene_name, seed=0)
    mats = tuple(sorted({s.material.type_id for s in world.spheres} |
                        {m.material.type_id for m in world.meshes}))
    iors = {s.material.ior for s in world.spheres if s.material.type_id == 3}
    iors |= {m.material.ior for m in world.meshes if m.material.type_id == 3}
    static_ior = iors.pop() if len(iors) == 1 else None
    key = crng.key_from_seed(0)

    defaults = {}
    base = None
    base_img = None
    print(f"scene={scene_name} {width}x{height} spp={spp} depth=50 reps={reps}",
          flush=True)
    for name, overrides in variants:
        for k, v in overrides.items():
            if k.startswith("_NO_"):  # sweep-local switch, not a trace attr
                continue
            defaults.setdefault(k, getattr(trace, k))
            setattr(trace, k, v)
        try:
            scene = compile_scene(world, spatial_sort=True)
            render = trace.make_renderer(
                world.camera, width, height, spp, 50,
                material_set=mats,
                tile_rows=trace.DEFAULT_TILE_ROWS,
                static_ior=(None if overrides.get("_NO_STATIC_IOR")
                            else static_ior),
            )
            t0 = time.perf_counter()
            img, segs = render(scene, key, 0)
            img_np = np.asarray(img)
            compile_s = time.perf_counter() - t0
            # Every variant here is an exact transform (same winners, same
            # draws): images must match the first variant bit-for-bit.
            if base_img is None:
                base_img = img_np
            elif not np.array_equal(img_np, base_img):
                print(f"!! {name}: image differs from baseline", flush=True)
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                img, segs = render(scene, key, 0)
                np.asarray(img)
                times.append(time.perf_counter() - t0)
            t = min(times)
            segs_f = float(np.asarray(segs))
            rel = "" if base is None else f"  ({(t / base - 1) * 100:+.1f}% vs baseline)"
            if base is None:
                base = t
            print(
                f"{name:18s} {t*1e3:8.1f} ms  {segs_f/t/1e6:6.1f} Mrays/s"
                f"  (compile {compile_s:.0f}s){rel}",
                flush=True,
            )
        finally:
            for k, v in defaults.items():
                setattr(trace, k, v)
    return 0


if __name__ == "__main__":
    sys.exit(main())
