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
       run = max(4, MIN_SAMPLES/spp)), STREAM_BACKEND (pallas),
       STREAM_BATCH (frame batch K: int, or "auto" = window of ~128
       samples per call, or "1"), STREAM_SHARD ("none" or "tiles":
       route through the tile-sharded shard_map renderer on the default
       mesh — on 1 chip this measures the shard_map wrapper's overhead
       over the direct kernel call; on N chips, multi-chip streaming)
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
    batch_env = os.environ.get("STREAM_BATCH", "1")
    shard = os.environ.get("STREAM_SHARD", "none")

    world = get_scene(scene_name, seed=0)
    scene = compile_scene(world, spatial_sort=len(world.spheres) > 64 or world.triangle_count > 64)
    mats = tuple(sorted({s.material.type_id for s in world.spheres} |
                        {m.material.type_id for m in world.meshes}))
    iors = {s.material.ior for s in world.spheres if s.material.type_id == 3}
    iors |= {m.material.ior for m in world.meshes if m.material.type_id == 3}
    static_ior = iors.pop() if len(iors) == 1 else None
    key = crng.key_from_seed(0)

    if shard == "tiles":
        import functools

        from myraytracer_tpu.parallel.sharding import (
            make_tile_sharded_renderer,
        )

        make_renderer = functools.partial(
            make_tile_sharded_renderer, block_factory=backend
        )
    elif backend == "pallas":
        from myraytracer_tpu.kernels.trace import make_renderer
    else:
        from myraytracer_tpu.render.integrator import make_renderer

    print(f"scene={scene_name} {width}x{height} depth={depth} "
          f"backend={backend} shard={shard} (pipelined streaming)",
          flush=True)

    rows = []
    for spp in spps:
        if batch_env == "auto":
            # ~128-sample windows; K caps at 64 (K=128 kernels hit
            # pathological Mosaic compile times, measured 2026-08-17)
            K = max(1, min(64, -(-128 // spp)))
        else:
            K = max(1, int(batch_env))
        render = make_renderer(
            world.camera, width, height, spp, depth,
            material_set=mats, static_ior=static_ior,
            **({"frames": K} if K > 1 else {}),
        )
        # Force with a tiny lazy slice: device_get of the full K-frame
        # stack (~740 MB at K=64, 1200x800) would make the measurement
        # tunnel-transfer-bound; production (RenderSession) blends the
        # frames on device and only ever fetches the final framebuffer.
        force = lambda a: np.asarray(a.ravel()[-4:])  # noqa: E731

        n_calls = max(2, -(-min_samples // (spp * K)))
        t0 = time.perf_counter()
        img, segs = render(scene, key, jnp.uint32(0))
        force(img)
        compile_s = time.perf_counter() - t0
        # one forced steady-state warm call
        img, _ = render(scene, key, jnp.uint32(K * spp))
        force(img)

        t0 = time.perf_counter()
        calls = [
            render(scene, key, jnp.uint32((i + 2) * K * spp))
            for i in range(n_calls)
        ]
        total = 0.0
        for j, (img, segs) in enumerate(calls):
            force(img)  # force in order
            total += float(segs)
            calls[j] = None  # free the K-frame stack on device
        dt = time.perf_counter() - t0
        n_frames = n_calls * K
        mrays = total / dt / 1e6
        ms_frame = dt / n_frames * 1e3
        rows.append((spp, K, ms_frame, mrays))
        print(f"spp={spp:4d} K={K:3d}  {n_frames:4d} frames "
              f"{ms_frame:8.1f} ms/frame  {mrays:7.1f} Mrays/s "
              f"(compile {compile_s:.0f}s)", flush=True)

    print("\n| samples/frame | frame batch | ms/frame | Mrays/s/chip |",
          flush=True)
    print("|---|---|---|---|", flush=True)
    for spp, K, ms, mr in rows:
        print(f"| {spp} | {K} | {ms:.1f} | {mr:.1f} |", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
