"""Denoiser quality A/B: RMSE vs a high-spp reference, raw vs filtered.

Methodology (same shape as tools/adaptive_bench.py / rr_bench.py):

* render the scene at several low sample counts and a high-spp reference
  (identical stream — the low-spp images are prefixes of the reference's
  accumulation, so the only variable is the estimator's sample count);
* report RMSE of the raw and the denoised framebuffer against the
  reference, plus the implied *sample-efficiency* factor: raw Monte
  Carlo RMSE scales ~1/sqrt(n), so matching RMSE(raw @ n) with
  RMSE(denoised @ m) means the filter is worth ~n/m samples of compute;
* optional sigma sweep (DB_SWEEP=1) grids the three edge-stopping
  sigmas around the defaults to re-derive them per scene.

Env knobs: DB_SCENE (default three-sphere), DB_W/DB_H, DB_SPP (per
frame), DB_DEPTH, DB_REF_FRAMES (reference frame count), DB_FRAMES
(comma list of low-spp frame counts), DB_BACKEND, DB_SWEEP, DB_ITERS.

Run on TPU for the BENCH.md numbers; CPU works for small configs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENE = os.environ.get("DB_SCENE", "three-sphere")
W = int(os.environ.get("DB_W", "320"))
H = int(os.environ.get("DB_H", "180"))
SPP = int(os.environ.get("DB_SPP", "4"))
DEPTH = int(os.environ.get("DB_DEPTH", "16"))
REF_FRAMES = int(os.environ.get("DB_REF_FRAMES", "512"))
FRAMES = [int(x) for x in os.environ.get("DB_FRAMES", "1,2,4,8,16").split(",")]
BACKEND = os.environ.get("DB_BACKEND", "")
SWEEP = os.environ.get("DB_SWEEP", "0") == "1"
# Comma list sweeps the iteration ladder (bias floor vs smoothing reach).
ITERS_LIST = [int(x) for x in os.environ.get("DB_ITERS", "5").split(",")]
ITERS = ITERS_LIST[0]


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def disp(a):
    """Display-space encode (clip + sRGB EOTF) for the perceptual RMSE
    column. Linear RMSE over-weights super-bright emissive pixels that
    the display transform compresses anyway (a cornell light smear
    dominates linear RMSE while being nearly invisible after tonemap),
    so emissive-scene ladders are judged in the space users see."""
    a = np.clip(np.asarray(a), 0.0, 1.0)
    lo = a * 12.92
    hi = 1.055 * np.power(np.maximum(a, 1e-8), 1.0 / 2.4) - 0.055
    return np.where(a <= 0.0031308, lo, hi)


def main():
    import jax
    import jax.numpy as jnp

    if not BACKEND or jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")

    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.denoise import (
        DEFAULT_SIGMA_COLOR, DEFAULT_SIGMA_DEPTH, DEFAULT_SIGMA_NORMAL,
        Denoiser, atrous_denoise,
    )
    from myraytracer_tpu.render.dispatch import make_session
    from myraytracer_tpu.scene.presets import get_scene

    world = get_scene(SCENE, seed=0)
    cfg = RenderConfig(
        width=W, height=H, samples_per_frame=SPP, ray_depth=DEPTH,
        backend=BACKEND or ("pallas" if jax.default_backend() == "tpu"
                            else "jnp"),
    )
    session = make_session(world, cfg)
    print(f"denoise_bench scene={SCENE} {W}x{H} spp/frame={SPP} "
          f"depth={DEPTH} backend={session.backend_resolved} "
          f"ref={REF_FRAMES * SPP} spp", file=sys.stderr)

    # One accumulation stream; snapshot the framebuffer at each cut.
    snaps = {}
    done = 0
    for n in sorted(set(FRAMES + [REF_FRAMES])):
        while done < n:
            session.step()
            done += 1
        snaps[n] = np.asarray(session.framebuffer)
    ref = snaps[REF_FRAMES]

    dn = Denoiser(world, W, H, iterations=max(ITERS_LIST))
    albedo, normal, depth = dn._features(session.scene.cam)

    ref_d = disp(ref)
    rows = []
    for iters in ITERS_LIST:
        print(f"{'spp':>6} {'rmse raw':>10} {'rmse dn':>10} {'gain':>6} "
              f"{'eff x':>6} {'disp raw':>9} {'disp dn':>9} {'deff':>6} "
              f"  (iters={iters})", file=sys.stderr)
        for n in FRAMES:
            if n == REF_FRAMES:
                continue
            raw = snaps[n]
            t0 = time.perf_counter()
            out = np.asarray(atrous_denoise(
                jnp.asarray(raw), albedo, normal, depth, iters,
                *dn.sigmas,
            ))
            dt = time.perf_counter() - t0
            r_raw, r_dn = rmse(raw, ref), rmse(out, ref)
            d_raw, d_dn = rmse(disp(raw), ref_d), rmse(disp(out), ref_d)
            # Equal-RMSE sample efficiency from the 1/sqrt(n) law:
            # n_equiv / n = (r_raw / r_dn)^2.
            eff = (r_raw / r_dn) ** 2
            deff = (d_raw / d_dn) ** 2
            rows.append((iters, n * SPP, r_raw, r_dn, eff, d_raw, d_dn,
                         deff, dt))
            print(f"{n * SPP:>6} {r_raw:>10.5f} {r_dn:>10.5f} "
                  f"{r_raw / r_dn:>6.2f} {eff:>6.2f} {d_raw:>9.5f} "
                  f"{d_dn:>9.5f} {deff:>6.2f}", file=sys.stderr)

    # The production auto schedule, evaluated against the same reference:
    # what noise_iterations(estimate_noise(raw)) would actually pick at
    # each cut, and its display-space efficiency — the measured check of
    # "within one step of the optimum, never worse than raw".
    from myraytracer_tpu.render.denoise import (
        estimate_noise, noise_iterations,
    )

    auto_rows = []
    print("auto (noise-driven) picks:", file=sys.stderr)
    for n in FRAMES:
        if n == REF_FRAMES:
            continue
        raw = snaps[n]
        noise = estimate_noise(raw)
        k = noise_iterations(noise)
        out = raw if k == 0 else np.asarray(atrous_denoise(
            jnp.asarray(raw), albedo, normal, depth, k, *dn.sigmas,
        ))
        d_raw, d_dn = rmse(disp(raw), ref_d), rmse(disp(out), ref_d)
        deff = 1.0 if k == 0 else (d_raw / d_dn) ** 2
        auto_rows.append(
            {"spp": n * SPP, "noise": round(noise, 5), "iters": k,
             "efficiency_disp_x": deff}
        )
        print(f"  spp={n * SPP:>4} noise={noise:.5f} -> k={k} "
              f"disp-eff={deff:.2f}", file=sys.stderr)

    if SWEEP:
        raw = jnp.asarray(snaps[FRAMES[len(FRAMES) // 2]])
        base = rmse(raw, ref)
        print(f"sweep at {FRAMES[len(FRAMES) // 2] * SPP} spp "
              f"(raw {base:.5f})", file=sys.stderr)
        best = None
        for sc in (1.0, 2.0, 4.0, 8.0, 16.0):
            for sn in (0.15, 0.35, 0.8):
                for sz in (0.03, 0.07, 0.15):
                    out = atrous_denoise(
                        raw, albedo, normal, depth, ITERS, sc, sn, sz
                    )
                    r = rmse(out, ref)
                    if best is None or r < best[0]:
                        best = (r, sc, sn, sz)
                    print(f"  sc={sc:<4} sn={sn:<4} sz={sz:<4} "
                          f"rmse={r:.5f}", file=sys.stderr)
        print(f"best: rmse={best[0]:.5f} sigma_color={best[1]} "
              f"sigma_normal={best[2]} sigma_depth={best[3]} "
              f"(defaults {DEFAULT_SIGMA_COLOR}/{DEFAULT_SIGMA_NORMAL}/"
              f"{DEFAULT_SIGMA_DEPTH})", file=sys.stderr)

    import json

    print(json.dumps({
        "scene": SCENE, "size": [W, H],
        "auto_rows": auto_rows,
        "rows": [
            {"iters": it, "spp": s, "rmse_raw": a, "rmse_dn": b,
             "efficiency_x": e, "rmse_raw_disp": da, "rmse_dn_disp": db,
             "efficiency_disp_x": de, "filter_s": round(dt, 4)}
            for it, s, a, b, e, da, db, de, dt in rows
        ],
    }))


if __name__ == "__main__":
    main()
