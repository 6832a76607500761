"""Russian-roulette equal-quality wall-clock A/B (run on the TPU).

For each scene, renders a fixed sample budget with rr=0 and rr=N and
reports wall-clock, traced segments, and RMSE against a high-spp
reference — the accept/reject evidence for the --rr knob: RR must cut
wall-clock more than its added variance costs in equal-RMSE terms
(win = (t_base / t_rr) * (rmse_base / rmse_rr)^2, using the 1/sqrt(n)
noise model to convert the rmse ratio into a sample-count ratio).

Env: RR_SCENES ("final,cornell"), RR_N (5), RR_SPP (128), RR_WH
("1200x800"), RR_DEPTH (50), RR_REF_SPP (1500), RR_REPS (2).
Usage: python tools/rr_bench.py
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

SCENES = os.environ.get("RR_SCENES", "final,cornell").split(",")
RR_N = int(os.environ.get("RR_N", "5"))
SPP = int(os.environ.get("RR_SPP", "128"))
W, H = (int(x) for x in os.environ.get("RR_WH", "1200x800").split("x"))
DEPTH = int(os.environ.get("RR_DEPTH", "50"))
REF_SPP = int(os.environ.get("RR_REF_SPP", "1500"))
REPS = int(os.environ.get("RR_REPS", "2"))


def main() -> int:
    import jax.numpy as jnp

    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.kernels.trace import make_renderer
    from myraytracer_tpu.render.camera import pack_camera
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import get_scene
    from myraytracer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    key = crng.key_from_seed(0)

    for scene_name in SCENES:
        world = get_scene(scene_name, seed=0)
        scene = compile_scene(
            world,
            spatial_sort=len(world.spheres) > 64 or world.triangle_count > 64,
        )
        if not world.camera.reference_mode:
            scene = scene._replace(
                cam=jnp.asarray(pack_camera(world.camera, W, H))
            )
        mats = {s.material.type_id for s in world.spheres}
        mats |= {m.material.type_id for m in world.meshes}
        kwargs = dict(
            material_set=tuple(sorted(mats)) or None,
            static_ior=world.static_ior,
            sky=world.ambient,
        )

        ref_path = pathlib.Path(
            f"/tmp/rr_ref_{scene_name}_{W}x{H}_d{DEPTH}_s{REF_SPP}.npy"
        )
        if ref_path.exists():
            img_ref = np.load(ref_path)
        else:
            ref_r = make_renderer(world.camera, W, H, REF_SPP, DEPTH, **kwargs)
            img_ref = np.asarray(ref_r(scene, crng.key_from_seed(99), 0)[0])
            np.save(ref_path, img_ref)

        rows = {}
        for rr in (0, RR_N):
            r = make_renderer(
                world.camera, W, H, SPP, DEPTH, rr=rr, **kwargs
            )
            img = np.asarray(r(scene, key, jnp.uint32(0))[0])  # warm
            best_t, segs = 1e30, 0.0
            for i in range(REPS):
                t0 = time.perf_counter()
                img_t, segs_t = r(scene, key, jnp.uint32((i + 1) * SPP))
                img_t = np.asarray(img_t)
                best_t = min(best_t, time.perf_counter() - t0)
                segs = float(segs_t)
            rmse = float(np.sqrt(np.mean((img - img_ref) ** 2)))
            rows[rr] = (best_t, segs, rmse)
            print(
                f"{scene_name} rr={rr}: {best_t:6.2f}s  "
                f"{segs/1e6:8.1f}M segs  {segs/best_t/1e6:6.1f} Mrays/s  "
                f"rmse {rmse:.5f}", flush=True,
            )
        t0, _, e0 = rows[0]
        t1, _, e1 = rows[RR_N]
        win = (t0 / t1) * (e0 / e1) ** 2
        print(
            f"{scene_name}: rr={RR_N} equal-RMSE wall-clock win = "
            f"{win:.2f}x  (speed {t0/t1:.2f}x, rmse ratio {e1/e0:.3f} -> "
            f"sample-cost {((e1/e0)**2):.2f}x)", flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
