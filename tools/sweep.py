"""Kernel-config sweep on the real final scene (run on the TPU).

Measures frame time for a list of KernelConfig overrides
(kernels/trace.py), each built as an explicit config object (no module
state is mutated). Used to re-test tuning decisions after structural
changes (e.g. the 7x in-situ-vs-isolated sweep throughput gap measured by
tools/ablate.py, suspected to be register pressure around the lax.cond
chunk gates).

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

# (name, {KernelConfig field: value}); DEFAULT_TILE_ROWS and _NO_* keys
# are sweep-local switches handled outside the config.
VARIANTS = [
    ("baseline", {}),
    # Discriminant guard back on (pre-NaN-propagation quadratic):
    ("guard", {"SQRT_GUARD": True}),
    # Tree-combine sweep widths (exact; shorter carry select chains).
    # Measured at spp 32 vs w1: w2 -9.9%, w4 -24.1%, w8 -23.5%; w4 is the
    # default now.
    ("w1", {"SWEEP_WIDTH": 1}),
    ("w2", {"SWEEP_WIDTH": 2}),
    ("w8", {"SWEEP_WIDTH": 8}),
    ("w16", {"SWEEP_WIDTH": 16}),
    ("w4-chunk64", {"CULL_CHUNK": 64}),
    ("w4-chunk96", {"CULL_CHUNK": 96}),
    ("w4-tile8", {"DEFAULT_TILE_ROWS": 8}),
    ("w4-tile24", {"DEFAULT_TILE_ROWS": 24}),
    # Spelled-out window logic back on (pre-fusion; exact transform pair):
    ("window-old", {"WINDOW_FUSE": False}),
    # Camera baked into the compiled kernel (pre-runtime-camera path):
    ("static-cam", {"STATIC_CAM": True}),
    # Pixel-block aspect for the tile→pixel mapping (64x32 default):
    ("block32", {"BLOCK_W": 32}),
    ("block128", {"BLOCK_W": 128}),
    # Two-level gating on the final scene: finer chunks cut entered-sweep
    # work; the superchunk gate amortizes the extra gates.
    ("chunk32-s4", {"SUPER": 4, "SUPER_MIN": 4}),
    ("chunk16-s8", {"CULL_CHUNK": 16, "SUPER": 8, "SUPER_MIN": 8}),
    ("chunk16-s4", {"CULL_CHUNK": 16, "SUPER": 4, "SUPER_MIN": 4}),
    ("chunk8-s8", {"CULL_CHUNK": 8, "SUPER": 8, "SUPER_MIN": 8}),
    ("ungated-fetch", {"GATED_FETCH": False}),
    ("no-cull", {"FORCE_CULL": False}),
    ("no-cull+ungated", {"FORCE_CULL": False, "GATED_FETCH": False}),
    ("chunk128", {"CULL_CHUNK": 128}),
    ("chunk32", {"CULL_CHUNK": 32}),
    ("tile8", {"DEFAULT_TILE_ROWS": 8}),
    # Full 486-sphere hit+fetch sweeps, fully unrolled, zero gates: the
    # "sweeps at isolated VPU throughput" hypothesis test.
    ("no-cull-unrolled", {"FORCE_CULL": False, "UNROLL_MAX": 512}),
    ("chunk16", {"CULL_CHUNK": 16}),
    ("chunk24", {"CULL_CHUNK": 24}),
    ("chunk48", {"CULL_CHUNK": 48}),
    # Winner record carried through the hit sweep; no separate fetch pass.
    ("merged", {"MERGED_FETCH": True}),
    ("merged-unrolled", {"MERGED_FETCH": True, "FORCE_CULL": False,
                         "UNROLL_MAX": 512}),
    ("merged-chunk32", {"MERGED_FETCH": True, "CULL_CHUNK": 32}),
    ("unmerged", {"MERGED_FETCH": False}),
    ("dyn-ior", {"_NO_STATIC_IOR": True}),
    ("chunk96", {"CULL_CHUNK": 96}),
    ("tile24", {"DEFAULT_TILE_ROWS": 24}),
    ("tile32", {"DEFAULT_TILE_ROWS": 32}),
    ("tile24-chunk96", {"DEFAULT_TILE_ROWS": 24, "CULL_CHUNK": 96}),
    ("tile24-chunk128", {"DEFAULT_TILE_ROWS": 24, "CULL_CHUNK": 128}),
    # Mesh-at-scale knobs (SWEEP_SCENE=mesh:5 etc.). Measured outcome now
    # wired as the TRI_CHUNK=0 auto ladder (trace.TRI_CHUNK_AUTO): 64 at
    # <=768 tris, 32 to 8192, 16 past that. The explicit variants stay
    # for re-testing after structural changes.
    ("tri64", {"TRI_CHUNK": 64}),
    ("tri32", {"TRI_CHUNK": 32}),
    ("tri16", {"TRI_CHUNK": 16}),
    ("tri8", {"TRI_CHUNK": 8}),
    ("tri16-s16", {"TRI_CHUNK": 16, "SUPER": 16}),
    ("tri32-s4", {"TRI_CHUNK": 32, "SUPER": 4}),
    ("tri128", {"TRI_CHUNK": 128}),
    ("tri32-s16", {"TRI_CHUNK": 32, "SUPER": 16}),
    ("s16", {"SUPER": 16}),
    ("s32", {"SUPER": 32}),
    ("s4", {"SUPER": 4}),
    ("mesh-tile8", {"DEFAULT_TILE_ROWS": 8}),
    ("mesh-tile8-tri32", {"DEFAULT_TILE_ROWS": 8, "TRI_CHUNK": 32}),
    # --- Per-ray culling experiments (round 5; measured outcome now the
    # production default: partition="kd", CULL_CHUNK=48 — BENCH.md
    # "Per-ray culling". Builds below default to the kd partition; the
    # "morton" control re-tests the old curve order.) ------------------
    ("morton", {"_PARTITION": "morton"}),
    # Per-lane chunk mask ANDed into `better` (exact; no control flow;
    # measured reject +1.1%):
    ("lane-gate", {"LANE_GATE": True}),
    # Tighter chunk AABBs: balanced-kd equal-size groups instead of
    # Morton-consecutive ones (scene-compile change, same kernel):
    ("kd", {"_PARTITION": "kd"}),
    ("kd-lane", {"_PARTITION": "kd", "LANE_GATE": True}),
    # Finer chunks paired with the tighter partition (16 lost with Morton
    # boxes; tighter boxes shift the gate-overhead/sweep-width balance):
    ("kd-chunk16", {"_PARTITION": "kd", "CULL_CHUNK": 16}),
    ("kd-chunk16-s8", {"_PARTITION": "kd", "CULL_CHUNK": 16,
                       "SUPER": 8, "SUPER_MIN": 8}),
    ("kd-chunk24", {"_PARTITION": "kd", "CULL_CHUNK": 24}),
    ("kd-chunk48", {"_PARTITION": "kd", "CULL_CHUNK": 48}),
    # Diagnostic (ulp-different, never production): sqrt -> disc*rsqrt,
    # quantifying the sqrt share of the sweep's dependency latency:
    ("rsqrt", {"SQRT_RSQRT": True}),
    # Round 2: the kd win grows with chunk width (48 beat 32) — find the
    # knee; morton-chunk48 is the control isolating partition from width.
    ("chunk48-m", {"CULL_CHUNK": 48}),
    ("kd-chunk64", {"_PARTITION": "kd", "CULL_CHUNK": 64}),
    ("kd-chunk96", {"_PARTITION": "kd", "CULL_CHUNK": 96}),
    ("kd-chunk128", {"_PARTITION": "kd", "CULL_CHUNK": 128}),
    ("kd-chunk64-t24", {"_PARTITION": "kd", "CULL_CHUNK": 64,
                        "DEFAULT_TILE_ROWS": 24}),
    # Round-5 fine bracket around the adopted kd/48 default:
    ("chunk40", {"CULL_CHUNK": 40}),
    ("chunk56", {"CULL_CHUNK": 56}),
]


def main() -> int:
    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.kernels import trace
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import get_scene

    spp = int(os.environ.get("SWEEP_SPP", "32"))
    reps = int(os.environ.get("SWEEP_REPS", "3"))
    depth = int(os.environ.get("SWEEP_DEPTH", "50"))
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

    print(f"scene={scene_name} {width}x{height} spp={spp} depth={depth} "
          f"reps={reps}", flush=True)

    # Build + compile every variant first, then time them ROUND-ROBIN:
    # the TPU drifts between distinct performance phases (~±10%) over a
    # multi-minute run, so sequential per-variant timing is unreliable —
    # interleaving rounds and taking each variant's min cancels it.
    built = []
    base_img = None
    for name, overrides in variants:
        cfg_kw = {k: v for k, v in overrides.items()
                  if not k.startswith("_") and k != "DEFAULT_TILE_ROWS"}
        config = trace.KernelConfig(**cfg_kw)
        scene = compile_scene(
            world, spatial_sort=True,
            partition=overrides.get("_PARTITION", "kd"),
            partition_chunk=config.CULL_CHUNK,
        )
        render = trace.make_renderer(
            world.camera, width, height, spp, depth,
            material_set=mats,
            tile_rows=overrides.get("DEFAULT_TILE_ROWS",
                                    trace.DEFAULT_TILE_ROWS),
            static_ior=(None if overrides.get("_NO_STATIC_IOR")
                        else static_ior),
            config=config,
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
            # Mosaic contracts FMAs differently for different static
            # code shapes; ulp-of-zero discriminants can flip (the
            # characterized envelope: ~1 px / 1e6 at 1 ulp, spp 500).
            nd = int((img_np != base_img).any(axis=-1).sum())
            print(
                f"!! {name}: differs from baseline on {nd} px "
                f"(maxdiff {float(np.abs(img_np - base_img).max()):.2e})",
                flush=True,
            )
        print(f"built {name} (compile {compile_s:.0f}s)", flush=True)
        built.append((name, render, scene, [float("inf")]))

    # Per-round ratios to the first variant, median across rounds: the
    # TPU flips between performance phases lasting minutes, so even
    # min-over-interleaved-rounds is biased when a flip lands mid-round.
    # A single round (~seconds) sits inside one phase; its ratios are
    # clean, and the median across rounds rejects flip-straddling rounds.
    times = {name: [] for name, *_ in built}
    for r in range(reps):
        order = built if r % 2 == 0 else list(reversed(built))
        round_t = {}
        for name, render, scene, _ in order:
            t0 = time.perf_counter()
            img, segs = render(scene, key, 0)
            np.asarray(img)
            round_t[name] = time.perf_counter() - t0
        for name, t in round_t.items():
            times[name].append(t)

    def median(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    base_name = built[0][0]
    ratios = {
        name: median([times[name][r] / times[base_name][r]
                      for r in range(reps)])
        for name, *_ in built
    }
    for name, render, scene, _ in built:
        t = median(times[name])
        segs_f = float(np.asarray(render(scene, key, 0)[1]))
        rel = ("" if name == base_name
               else f"  ({(ratios[name] - 1) * 100:+.1f}% vs {base_name}, per-round median)")
        print(f"{name:18s} {t*1e3:8.1f} ms  {segs_f/t/1e6:6.1f} Mrays/s{rel}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
