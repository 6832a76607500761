"""Progressive streaming ladder at small sample windows (run on the TPU).

The reference's default workload is progressive accumulation at
``samples_per_frame=1`` (``raytracer/src/lib.rs:33``; unbounded redraw
loop ``lib.rs:187-196``). This tool measures *pipelined streaming*
throughput — dispatch every frame back-to-back, force in order, exactly
like the production accumulation loop — at spp 1/4/8/32/125 on the
final scene, where per-call fixed costs dominate if unfixed
(VERDICT r1 item 1).

Usage: python tools/stream.py
Env:   STREAM_SPPS (1,4,8,32,125), STREAM_WH (1200x800), STREAM_SCENE
       (final), STREAM_DEPTH (50), STREAM_MIN_SAMPLES (256: frames per
       run = max(4, MIN_SAMPLES/spp)), STREAM_BACKEND (pallas)
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import get_scene

    spps = [int(s) for s in os.environ.get(
        "STREAM_SPPS", "1,4,8,32,125").split(",")]
    wh = os.environ.get("STREAM_WH", "1200x800")
    width, height = (int(x) for x in wh.split("x"))
    depth = int(os.environ.get("STREAM_DEPTH", "50"))
    scene_name = os.environ.get("STREAM_SCENE", "final")
    min_samples = int(os.environ.get("STREAM_MIN_SAMPLES", "256"))
    backend = os.environ.get("STREAM_BACKEND", "pallas")

    world = get_scene(scene_name, seed=0)
    scene = compile_scene(world, spatial_sort=len(world.spheres) > 64)
    mats = tuple(sorted({s.material.type_id for s in world.spheres} |
                        {m.material.type_id for m in world.meshes}))
    iors = {s.material.ior for s in world.spheres if s.material.type_id == 3}
    iors |= {m.material.ior for m in world.meshes if m.material.type_id == 3}
    static_ior = iors.pop() if len(iors) == 1 else None
    key = crng.key_from_seed(0)

    if backend == "pallas":
        from myraytracer_tpu.kernels.trace import make_renderer
    else:
        from myraytracer_tpu.render.integrator import make_renderer

    print(f"scene={scene_name} {width}x{height} depth={depth} "
          f"backend={backend} (pipelined streaming)", flush=True)

    rows = []
    for spp in spps:
        render = make_renderer(
            world.camera, width, height, spp, depth,
            material_set=mats, static_ior=static_ior,
        )
        n_frames = max(4, -(-min_samples // spp))
        t0 = time.perf_counter()
        img, segs = render(scene, key, jnp.uint32(0))
        np.asarray(img)
        compile_s = time.perf_counter() - t0
        # one forced steady-state warm frame
        img, _ = render(scene, key, jnp.uint32(spp))
        np.asarray(img)

        t0 = time.perf_counter()
        frames = [
            render(scene, key, jnp.uint32((i + 2) * spp))
            for i in range(n_frames)
        ]
        total = 0.0
        for img, segs in frames:
            np.asarray(img)  # force in order
            total += float(segs)
        dt = time.perf_counter() - t0
        mrays = total / dt / 1e6
        ms_frame = dt / n_frames * 1e3
        rows.append((spp, ms_frame, mrays))
        print(f"spp={spp:4d}  {n_frames:4d} frames  {ms_frame:8.1f} ms/frame"
              f"  {mrays:7.1f} Mrays/s  (compile {compile_s:.0f}s)",
              flush=True)

    print("\n| samples/frame | ms/frame | Mrays/s/chip |", flush=True)
    print("|---|---|---|", flush=True)
    for spp, ms, mr in rows:
        print(f"| {spp} | {ms:.0f} | {mr:.1f} |", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
