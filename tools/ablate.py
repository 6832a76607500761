"""In-situ kernel component attribution (run on the TPU).

tools/microbench.py measures primitive costs in isolation; this tool
measures each megakernel body component *in place*: it rebuilds the
final-scene renderer with ``KernelConfig(ABLATE=...)`` set to duplicate
one component per run. The duplicate's inputs are perturbed by an opaque
runtime-zero (so Mosaic cannot CSE it with the real computation) and its
outputs fold into ``segs * 0.0`` (so it cannot be DCE'd). Runtime
behavior — iteration counts, gate branch decisions, the image — is
bit-identical to baseline, so

    t(dup) - t(baseline)  =  that component's true per-frame cost.

Components:
  hit      the full closest-hit sweep (chunk-AABB culled)
  gates    slab test + any() + lax.cond per chunk, empty bodies
  fetch    the winner-record select sweep (gated)
  rng      the three per-bounce threefry draw2 calls
  samplers unit-sphere/unit-ball construction from uniforms
  scatter  the compute-all-select material scatter
  regen    a camera_ray() call (2 draw2 + ray-gen math)

Usage: python tools/ablate.py            (on the TPU; ~8 Mosaic compiles,
       20-260 s each on a cold cache — run in the background)
Env:   ABLATE_SPP (32), ABLATE_WIDTH/HEIGHT (1200x800), ABLATE_REPS (3),
       ABLATE_COMPONENTS (comma list; default all)
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

COMPONENTS = (
    "hit", "gates", "fetch", "rng", "samplers", "scatter", "regen",
)


def main() -> int:
    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.kernels import trace
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import get_scene

    spp = int(os.environ.get("ABLATE_SPP", "32"))
    width = int(os.environ.get("ABLATE_WIDTH", "1200"))
    height = int(os.environ.get("ABLATE_HEIGHT", "800"))
    reps = int(os.environ.get("ABLATE_REPS", "3"))
    comps = tuple(
        c for c in os.environ.get(
            "ABLATE_COMPONENTS", ",".join(COMPONENTS)
        ).split(",") if c
    )

    world = get_scene("final", seed=0)
    scene = compile_scene(world, spatial_sort=True)
    mats = {s.material.type_id for s in world.spheres}
    key = crng.key_from_seed(0)

    def measure(ablate: tuple) -> tuple:
        render = trace.make_renderer(
            world.camera, width, height, spp, 50,
            material_set=tuple(sorted(mats)),
            config=trace.KernelConfig(ABLATE=ablate),
        )
        t0 = time.perf_counter()
        img, segs = render(scene, key, 0)
        img = np.asarray(img)  # force (block_until_ready lies on axon)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            img2, segs2 = render(scene, key, 0)
            np.asarray(img2)
            times.append(time.perf_counter() - t0)
        return min(times), float(np.asarray(segs)), compile_s, img

    print(f"scene=final {width}x{height} spp={spp} depth=50 reps={reps}",
          flush=True)
    # Interleave a baseline before every component and compare each dup to
    # the mean of its neighboring baselines: the TPU drifts ±3-5% (and
    # sometimes 20% coming off idle) across a multi-minute run, which a
    # single up-front baseline cannot cancel.
    base_t, base_segs, cs, base_img = measure(())
    print(f"baseline: {base_t*1e3:8.1f} ms  ({base_segs/1e6:.0f} M segs, "
          f"{base_segs/base_t/1e6:.1f} Mrays/s; compile {cs:.0f}s)", flush=True)

    rows = []
    if trace.DEFAULT_CONFIG.MERGED_FETCH:
        comps = tuple(c for c in comps if c != "fetch")
    prev_base = base_t
    for comp in comps:
        t, segs, cs, img = measure((comp,))
        next_base, _, _, _ = measure(())
        local_base = (prev_base + next_base) / 2
        prev_base = next_base
        if segs != base_segs:
            print(f"!! {comp}: segs changed ({segs} vs {base_segs}) — "
                  "dup not inert, measurement invalid", flush=True)
        if not np.array_equal(img, base_img):
            print(f"!! {comp}: image changed — dup not inert", flush=True)
        dt = t - local_base
        rows.append((comp, dt, local_base))
        print(f"+{comp:9s} {t*1e3:8.1f} ms  Δ={dt*1e3:7.1f} ms "
              f"({dt/local_base*100:5.1f}% of local baseline "
              f"{local_base*1e3:.0f} ms; compile {cs:.0f}s)",
              flush=True)

    total = sum(dt for _, dt, _ in rows)
    mean_base = sum(b for _, _, b in rows) / max(1, len(rows))
    print(f"sum of component deltas: {total*1e3:.1f} ms "
          f"({total/mean_base*100:.1f}% of mean baseline) — the remainder "
          "is bookkeeping (miss/sky/regen selects) + loop/launch overhead",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
