"""Sample-window (spp) scaling ladder on the final scene (run on TPU).

Builds one renderer per spp point, then times them interleaved
(phase-drift-resistant, like tools/sweep.py) — the numbers behind the
BENCH.md headline table.

Usage: python tools/ladder.py
Env:   LADDER_SPP ("32,125,500"), LADDER_REPS (3), LADDER_WH (1200x800)
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
    from myraytracer_tpu.scene.presets import get_scene

    spps = [int(s) for s in os.environ.get("LADDER_SPP", "32,125,500").split(",")]
    reps = int(os.environ.get("LADDER_REPS", "3"))
    wh = os.environ.get("LADDER_WH", "1200x800")
    width, height = (int(x) for x in wh.split("x"))

    world = get_scene("final", seed=0)
    scene = compile_scene(world, spatial_sort=True)
    key = crng.key_from_seed(0)

    built = []
    for spp in spps:
        render = trace.make_renderer(
            world.camera, width, height, spp, 50,
            material_set=(1, 2, 3), static_ior=1.5,
        )
        t0 = time.perf_counter()
        img, segs = render(scene, key, 0)
        np.asarray(img)
        print(f"built spp={spp} (compile+frame {time.perf_counter() - t0:.0f}s)",
              flush=True)
        built.append((spp, render, float(np.asarray(segs))))

    times = {spp: [] for spp, *_ in built}
    for r in range(reps):
        order = built if r % 2 == 0 else list(reversed(built))
        for spp, render, _ in order:
            t0 = time.perf_counter()
            img, _ = render(scene, key, 0)
            np.asarray(img)
            times[spp].append(time.perf_counter() - t0)

    print(f"{width}x{height} depth=50, median of {reps} interleaved reps:",
          flush=True)
    for spp, render, segs in built:
        ts = sorted(times[spp])
        med = ts[len(ts) // 2]
        print(f"spp {spp:4d}: {med * 1e3:8.1f} ms  {segs / med / 1e6:6.1f} Mrays/s",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
