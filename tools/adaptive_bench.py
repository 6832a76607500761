"""Adaptive-vs-uniform equal-budget quality benchmark (run on the TPU).

Measures, on a chosen scene (default: the RTiOW final scene at full
resolution), the per-pixel RMSE against a high-spp reference image for

  * the uniform estimator at sample budgets B_i, and
  * the adaptive session (render/adaptive.py) at the same budgets,

plus wall-clock for each, so BENCH.md can report both the equal-budget
quality win and the equal-quality time win.

Env knobs: AB_W, AB_H, AB_DEPTH, AB_SPP (per adaptive round), AB_FB
(sub-windows per adaptive call — the frame-batching composition), AB_SCENE,
AB_REF_SPP (reference image), AB_BUDGETS (comma list, in uniform-frame
units of AB_SPP samples, e.g. "4,8,16"), AB_NSEL (blocks per round,
0 = auto 1/4 of the grid).

Usage: python tools/adaptive_bench.py
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

W = int(os.environ.get("AB_W", 1200))
H = int(os.environ.get("AB_H", 800))
DEPTH = int(os.environ.get("AB_DEPTH", 50))
SPP = int(os.environ.get("AB_SPP", 8))
SCENE = os.environ.get("AB_SCENE", "final")
REF_SPP = int(os.environ.get("AB_REF_SPP", 2000))
BUDGETS = [int(b) for b in os.environ.get("AB_BUDGETS", "4,8,16,32").split(",")]
NSEL = int(os.environ.get("AB_NSEL", 0))
FB = int(os.environ.get("AB_FB", 1))  # windows per adaptive call (frame_batch)


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def main():
    import jax.numpy as jnp

    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.kernels.trace import make_renderer
    from myraytracer_tpu.render.adaptive import AdaptiveSession
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import get_scene

    world = get_scene(SCENE, seed=0)
    scene = compile_scene(
        world, spatial_sort=len(world.spheres) > 64 or world.triangle_count > 64
    )
    if not world.camera.reference_mode:
        from myraytracer_tpu.render.camera import pack_camera

        scene = scene._replace(cam=jnp.asarray(pack_camera(world.camera, W, H)))
    mats = {s.material.type_id for s in world.spheres}
    mats |= {m.material.type_id for m in world.meshes}
    iors = {s.material.ior for s in world.spheres if s.material.type_id == 3}
    kwargs = dict(
        material_set=tuple(sorted(mats)) or None,
        static_ior=(iors.pop() if len(iors) == 1 else None),
        sky=world.ambient,
    )

    print(f"scene={SCENE} {W}x{H} depth={DEPTH} spp/round={SPP} "
          f"budgets={BUDGETS} (x{SPP} spp units)", flush=True)

    # Reference image (uniform, high spp, its own seed) — cached on disk
    # across invocations (the A/B sweeps re-run this tool many times).
    ref_path = pathlib.Path(
        f"/tmp/ab_ref_{SCENE}_{W}x{H}_d{DEPTH}_s{REF_SPP}.npy"
    )
    if ref_path.exists():
        img_ref = np.load(ref_path)
        print(f"reference {REF_SPP} spp: cached ({ref_path})", flush=True)
    else:
        t0 = time.perf_counter()
        ref_r = make_renderer(world.camera, W, H, REF_SPP, DEPTH, **kwargs)
        img_ref = np.asarray(ref_r(scene, crng.key_from_seed(99), 0)[0])
        print(f"reference {REF_SPP} spp: {time.perf_counter()-t0:.1f}s",
              flush=True)
        np.save(ref_path, img_ref)

    rows = []
    for budget in BUDGETS:
        total_spp = budget * SPP
        # Uniform at the budget: one kernel call of total_spp samples.
        uni = make_renderer(world.camera, W, H, total_spp, DEPTH, **kwargs)
        img_u = np.asarray(uni(scene, crng.key_from_seed(0), 0)[0])  # warm+run
        t0 = time.perf_counter()
        img_u = np.asarray(uni(scene, crng.key_from_seed(0), 0)[0])
        t_u = time.perf_counter() - t0
        e_u = rmse(img_u, img_ref)

        cfg = RenderConfig(
            width=W, height=H, samples_per_frame=SPP, ray_depth=DEPTH,
            seed=0, backend="pallas", frame_batch=FB,
        )
        sess = AdaptiveSession(world, cfg, n_sel=NSEL)
        sess.bootstrap()  # warms _round_ids (and the Mosaic kernel)
        # Warm _round_auto WITHOUT spending budget: each session's jit is a
        # fresh closure, so its XLA (re)compile would otherwise land inside
        # the timed region (AOT lower+compile leaves session state untouched).
        sess._round_auto.lower(sess.scene, sess.key, sess._state).compile()
        r0 = sess.rounds
        t0 = time.perf_counter()
        fb = sess.run_budget(budget)
        fb_np = np.asarray(fb)  # forces the round chain
        t_a = time.perf_counter() - t0
        n_rounds = sess.rounds - r0
        # Bootstrap time is excluded from t_a but its samples count toward
        # the budget (run_budget already accounts for them).
        e_a = rmse(fb_np, img_ref)
        smap = sess.spp_map
        rows.append((total_spp, e_u, t_u, e_a, t_a,
                     sess.samples_spent / (W * H), smap.min(), smap.max()))
        print(
            f"budget {total_spp:4d} spp | uniform rmse {e_u:.5f} ({t_u:6.2f}s)"
            f" | adaptive rmse {e_a:.5f} ({t_a:6.2f}s post-bootstrap,"
            f" {n_rounds} rounds = {1e3*t_a/max(n_rounds,1):.0f} ms/round,"
            f" {sess.samples_spent/(W*H):6.1f} spp spent,"
            f" block spp {smap.min()}..{smap.max()})",
            flush=True,
        )

    # Equal-quality interpolation: budget the uniform ladder needs to reach
    # each adaptive error (RMSE ~ 1/sqrt(n) fit on the uniform rows).
    print("\nequal-quality estimate (uniform spp needed for adaptive's rmse,")
    print("via rmse*sqrt(n)=const fit per uniform row):")
    for (n, e_u, _, e_a, _, spent, _, _) in rows:
        c = e_u * np.sqrt(n)
        need = (c / e_a) ** 2
        print(f"  adaptive at {spent:6.1f} spp matches uniform "
              f"~{need:7.1f} spp  ({need/max(spent,1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
