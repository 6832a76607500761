"""BASELINE config 5 settlement: CPU-with-BVH vs the TPU mesh kernel.

The north star ("faster per chip than a native runner on a 32-core CPU",
BASELINE.json) names a baseline the reference cannot supply for meshes —
it renders neither triangles nor on CPUs — so this harness produces it:
``native/mrt_cpu_bench --mesh`` (binned-SAH skip-link BVH, Möller-Trumbore,
the same builder the host-side preprocessing uses) over the *identical*
scene bytes the TPU kernel renders (myraytracer_tpu/native/meshdump.py).

For each subdivision level it reports:

* CPU-BVH Mrays/s on the cores actually present, and the honest x32
  extrapolation (this host has 1 core; a real 32-core part would also
  turbo differently — the extrapolation is labeled as such);
* the TPU megakernel Mrays/s on the same scene/camera/resolution
  (CC_TPU=1; skipped off-TPU).

Usage: python tools/cpu_mesh_baseline.py
Env:   CC_SUBDIVS ("2,3,4,5"), CC_WH ("480x270"), CC_SPP (8), CC_DEPTH
       (20), CC_THREADS (all), CC_TPU (1), CC_REPS (2)
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
BENCH_BIN = REPO / "native" / "mrt_cpu_bench"


def run_cpu(dump: pathlib.Path, w, h, spp, depth, threads) -> dict:
    out = subprocess.run(
        [str(BENCH_BIN), "--mesh", str(dump), str(w), str(h), str(spp),
         str(depth), str(threads)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    from myraytracer_tpu.native.meshdump import dump_world
    from myraytracer_tpu.scene.presets import mesh_scene

    subdivs = [int(s) for s in os.environ.get("CC_SUBDIVS", "2,3,4,5").split(",")]
    w, h = (int(x) for x in os.environ.get("CC_WH", "480x270").split("x"))
    spp = int(os.environ.get("CC_SPP", "8"))
    depth = int(os.environ.get("CC_DEPTH", "20"))
    threads = int(os.environ.get("CC_THREADS", "0")) or os.cpu_count()
    reps = int(os.environ.get("CC_REPS", "2"))
    want_tpu = os.environ.get("CC_TPU", "1") != "0"

    if not BENCH_BIN.exists():
        print("build native/mrt_cpu_bench first: make -C native cpu",
              file=sys.stderr)
        return 2

    tpu_render = None
    if want_tpu:
        import jax

        from myraytracer_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
        if jax.default_backend() != "tpu":
            print("# not on TPU: CPU columns only", file=sys.stderr)
            want_tpu = False

    print(f"# {w}x{h} spp={spp} depth={depth} cpu_threads={threads}")
    print("subdiv  tris    cpu-bvh(1x)  cpu-bvh(x32 extrap)  tpu-kernel  "
          "tpu/cpu32")
    for sub in subdivs:
        world = mesh_scene(subdivisions=sub)
        n_tris = world.triangle_count
        with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
            dump = pathlib.Path(f.name)
        dump_world(world, dump)

        cpu_rates = []
        for _ in range(reps):
            r = run_cpu(dump, w, h, spp, depth, threads)
            cpu_rates.append(r["mrays_per_s"])
        cpu1 = max(cpu_rates) / threads  # per-core, best of reps
        cpu32 = cpu1 * 32.0

        tpu_s = "-"
        ratio_s = "-"
        if want_tpu:
            import jax.numpy as jnp

            from myraytracer_tpu.core import rng as crng
            from myraytracer_tpu.kernels import trace
            from myraytracer_tpu.scene.compile import compile_scene

            if not trace.fits_in_smem(64, n_tris, tri_table_in_smem=False):
                tpu_s = "smem-cap"
            else:
                scene = compile_scene(world, spatial_sort=True)
                mats = tuple(sorted(
                    {m.material.type_id for m in world.meshes}
                ))
                render = trace.make_renderer(
                    world.camera, w, h, spp, depth, material_set=mats,
                    static_ior=world.static_ior,
                )
                key = crng.key_from_seed(0)
                img, segs = render(scene, key, jnp.uint32(0))
                np.asarray(img)  # compile + warm
                best = 0.0
                for i in range(reps):
                    t0 = time.perf_counter()
                    img, segs = render(scene, key, jnp.uint32((i + 1) * spp))
                    np.asarray(img)
                    dt = time.perf_counter() - t0
                    best = max(best, float(segs) / dt / 1e6)
                tpu_s = f"{best:.2f}"
                ratio_s = f"{best / cpu32:.2f}x"

        print(f"{sub:>6}  {n_tris:>6}  {cpu1:>10.3f}  {cpu32:>18.2f}  "
              f"{tpu_s:>10}  {ratio_s:>8}", flush=True)
        dump.unlink()
    return 0


if __name__ == "__main__":
    sys.exit(main())
