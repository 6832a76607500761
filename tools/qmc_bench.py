"""QMC-vs-uniform equal-spp quality benchmark.

Measures, per scene, the per-pixel RMSE against a converged reference
image for the default threefry camera stream and the scrambled-Sobol
(``qmc=True``) stream at the same sample budgets, and fits the implied
sample-efficiency win (uniform spp needed to reach the QMC error, via the
rmse*sqrt(n)=const fit on the uniform ladder — same methodology as
tools/adaptive_bench.py).

QMC restratifies only the camera dimensions (jitter + lens), so the win
concentrates where those dimensions carry the variance: anti-aliased
edges, defocus blur, and smooth sky/background regions. Frame cost is
unchanged up to the scrambled-Sobol transform (two threefry calls per
sample either way — BENCH.md has the measured on-TPU delta).

Env knobs: QB_W, QB_H, QB_DEPTH, QB_SCENE (comma list), QB_SPP (comma
list), QB_REF_SPP, QB_BACKEND (jnp|pallas), QB_TIME (1 = also time one
frame per variant, warmed, same process).

Usage: python tools/qmc_bench.py
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

W = int(os.environ.get("QB_W", 480))
H = int(os.environ.get("QB_H", 270))
DEPTH = int(os.environ.get("QB_DEPTH", 50))
SCENES = os.environ.get("QB_SCENE", "defocus,final").split(",")
SPPS = [int(s) for s in os.environ.get("QB_SPP", "4,16,64").split(",")]
REF_SPP = int(os.environ.get("QB_REF_SPP", 4000))
BACKEND = os.environ.get("QB_BACKEND", "pallas")
TIME = os.environ.get("QB_TIME", "1") not in ("0", "")


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def main():
    import jax.numpy as jnp

    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import get_scene

    if BACKEND == "pallas":
        from myraytracer_tpu.kernels.trace import make_renderer
    else:
        from myraytracer_tpu.render.integrator import make_renderer

    for scene_name in SCENES:
        world = get_scene(scene_name, seed=0)
        scene = compile_scene(
            world,
            spatial_sort=len(world.spheres) > 64 or world.triangle_count > 64,
        )
        if not world.camera.reference_mode:
            from myraytracer_tpu.render.camera import pack_camera

            scene = scene._replace(
                cam=jnp.asarray(pack_camera(world.camera, W, H))
            )
        mats = {s.material.type_id for s in world.spheres}
        mats |= {m.material.type_id for m in world.meshes}
        iors = {s.material.ior for s in world.spheres if s.material.type_id == 3}
        kwargs = dict(
            material_set=tuple(sorted(mats)) or None,
            static_ior=(iors.pop() if len(iors) == 1 else None),
            sky=world.ambient,
        )
        if BACKEND == "jnp":
            kwargs["sample_batch"] = 8

        print(f"\n== scene={scene_name} {W}x{H} depth={DEPTH} "
              f"backend={BACKEND} ref={REF_SPP} spp ==", flush=True)
        t0 = time.perf_counter()
        ref_r = make_renderer(world.camera, W, H, REF_SPP, DEPTH, **kwargs)
        img_ref = np.asarray(ref_r(scene, crng.key_from_seed(99), 0)[0])
        print(f"reference: {time.perf_counter()-t0:.1f}s", flush=True)

        rows = []
        for spp in SPPS:
            imgs, times = {}, {}
            for label, q in (("uniform", False), ("qmc", True)):
                r = make_renderer(
                    world.camera, W, H, spp, DEPTH, qmc=q, **kwargs
                )
                img = np.asarray(r(scene, crng.key_from_seed(0), 0)[0])  # warm
                if TIME:
                    t0 = time.perf_counter()
                    img = np.asarray(r(scene, crng.key_from_seed(0), 0)[0])
                    times[label] = time.perf_counter() - t0
                imgs[label] = img
            e_u, e_q = rmse(imgs["uniform"], img_ref), rmse(imgs["qmc"], img_ref)
            rows.append((spp, e_u, e_q))
            extra = ""
            if TIME:
                extra = (f" | {1e3*times['uniform']:.0f} vs "
                         f"{1e3*times['qmc']:.0f} ms/frame")
            print(f"spp {spp:4d} | uniform rmse {e_u:.5f} | qmc rmse "
                  f"{e_q:.5f} | ratio {e_u/max(e_q,1e-12):.2f}x{extra}",
                  flush=True)

        print("equal-quality estimate (uniform spp to reach qmc's rmse):")
        for (n, e_u, e_q) in rows:
            need = n * (e_u / max(e_q, 1e-12)) ** 2
            print(f"  qmc at {n:4d} spp matches uniform ~{need:7.1f} spp "
                  f"({need/n:.2f}x sample efficiency)", flush=True)


if __name__ == "__main__":
    main()
