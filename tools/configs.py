"""All five BASELINE configs, timed in ONE process (pipelined streaming).

One process means the TPU's performance phases hit every config equally
(BENCH.md "Methodology"), unlike per-config stream.py runs. Prints the
BENCH.md scoreboard table.

Env:   CFG_BACKEND (pallas), CFG_FRAMES (4: timed frames per config),
       CFG_SMALL=1 (tiny shapes, jnp — CI smoke), CFG_ONLY (comma list of
       config names to run, e.g. "light,cornell"), CFG_NEE=1 (next-event
       estimation on scenes that have lights; CFG_NEE=both times each
       light scene twice — off then on — in the same process).

Configs (BASELINE.md "Benchmark configs to report" + the emissive
extension scenes):
  1 lambertian  400x225  spp 100  depth 50
  2 three-sphere 1200x800 spp 125 depth 50
  3 defocus     1200x800 spp 125  depth 50
  4 final       1200x800 spp 500  depth 50   (the headline)
  5 mesh        480x270  spp 64   depth 20
  + light       1200x800 spp 125  depth 50
  + cornell     512x512  spp 125  depth 50
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

CONFIGS = [
    # name, scene, W, H, spp, depth
    ("lambertian", "lambertian", 400, 225, 100, 50),
    ("three-sphere", "three-sphere", 1200, 800, 125, 50),
    ("defocus", "defocus", 1200, 800, 125, 50),
    ("final", "final", 1200, 800, 500, 50),
    ("mesh", "mesh", 480, 270, 64, 20),
    ("light", "light", 1200, 800, 125, 50),
    ("cornell", "cornell", 512, 512, 125, 50),
]

SMALL = [(n, s, 48, 32, 2, 4) for (n, s, *_rest) in CONFIGS]


def main() -> int:
    small = os.environ.get("CFG_SMALL", "0") == "1"
    backend = os.environ.get(
        "CFG_BACKEND", "jnp" if small else "pallas"
    )
    n_frames = int(os.environ.get("CFG_FRAMES", "2" if small else "4"))
    only = os.environ.get("CFG_ONLY")
    if small:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import get_scene

    configs = SMALL if small else CONFIGS
    if only:
        names = {n.strip() for n in only.split(",")}
        configs = [c for c in configs if c[0] in names]

    key = crng.key_from_seed(0)
    rows = []
    nee_env = os.environ.get("CFG_NEE", "0")
    runs = []
    for cfg in configs:
        # CFG_NEE=both times each light-carrying config twice (off, on)
        # in the same process — the methodology-honest A/B (BENCH.md).
        runs.append((cfg, False))
        if nee_env in ("1", "both"):
            from myraytracer_tpu.render.lights import extract_lights

            if extract_lights(get_scene(cfg[1], seed=0)):
                if nee_env == "1":
                    runs[-1] = (cfg, True)
                else:
                    runs.append((cfg, True))
    for (name, scene_name, w, h, spp, depth), use_nee in runs:
        world = get_scene(scene_name, seed=0)
        scene = compile_scene(world, spatial_sort=len(world.spheres) > 64 or world.triangle_count > 64)
        mats = {s.material.type_id for s in world.spheres}
        mats |= {m.material.type_id for m in world.meshes}
        iors = {s.material.ior for s in world.spheres
                if s.material.type_id == 3}
        iors |= {m.material.ior for m in world.meshes
                 if m.material.type_id == 3}
        kw = dict(
            material_set=tuple(sorted(mats)) or None,
            static_ior=(iors.pop() if len(iors) == 1 else None),
            sky=world.ambient,
        )
        if use_nee:
            from myraytracer_tpu.render.lights import extract_lights

            name = name + "+nee"
            kw["nee_lights"] = extract_lights(world)
        if backend == "pallas":
            from myraytracer_tpu.kernels.trace import make_renderer
        else:
            from myraytracer_tpu.render.integrator import make_renderer
            kw["sample_batch"] = min(spp, 2)
        render = make_renderer(world.camera, w, h, spp, depth, **kw)

        t0 = time.perf_counter()
        img, segs = render(scene, key, 0)
        np.asarray(img).ravel()[:4]
        compile_s = time.perf_counter() - t0

        # Pipelined timing: dispatch all frames, force in order (the
        # production accumulation loop's overlap; BENCH.md methodology).
        outs = []
        t0 = time.perf_counter()
        for f in range(n_frames):
            outs.append(render(scene, key, (f + 1) * spp))
        seg_total = 0.0
        for img, segs in outs:
            np.asarray(img.ravel()[-4:])  # force, tiny transfer
            seg_total += float(segs)
        dt = time.perf_counter() - t0
        ms = dt / n_frames * 1e3
        mrays = seg_total / dt / 1e6
        rows.append((name, w, h, spp, depth, ms, mrays))
        print(
            f"{name:>12} {w}x{h} spp={spp} depth={depth}: "
            f"{ms:8.1f} ms/frame {mrays:8.1f} Mrays/s "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )

    print("\n| config | setup | ms/frame | Mrays/s/chip |")
    print("|---|---|---|---|")
    for name, w, h, spp, depth, ms, mrays in rows:
        print(f"| {name} | {w}×{h}, {spp} spp, depth {depth} "
              f"| {ms:.1f} | {mrays:.1f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
