"""Regenerate golden render arrays for tests/test_golden.py.

Run on the CPU platform (goldens are CPU-generated; the TPU path is
covered by statistical parity tests instead, since fp contraction differs):

    python tools/make_goldens.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.render.integrator import make_renderer
from myraytracer_tpu.scene import presets
from myraytracer_tpu.scene.compile import compile_scene

GOLDEN_DIR = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden"

CONFIGS = [
    # name, scene, W, H, spp, depth
    ("reference_32x18", "reference", 32, 18, 4, 8),
    ("three_sphere_32x18", "three-sphere", 32, 18, 4, 8),
    ("defocus_32x18", "defocus", 32, 18, 4, 8),
    ("final_48x32", "final", 48, 32, 2, 8),
    ("light_32x18", "light", 32, 18, 4, 8),
    ("cornell_32x18", "cornell", 32, 18, 4, 8),
    ("texture_32x18", "texture", 32, 18, 4, 8),
]



# Estimator/feature goldens (round 3): pin the exact MIS-NEE, Owen-QMC,
# Russian-roulette, and image-texture streams — the in-tree checks for
# these are statistical, so a silent estimator regression (a changed
# weight, a shifted draw slot) would otherwise pass. ``extra`` maps to
# make_renderer kwargs; "nee" resolves to the scene's extracted lights.
EXT_CONFIGS = [
    ("cornell_mis_32x18", "cornell", 32, 18, 4, 8, {"nee": True}),
    ("defocus_qmc_32x18", "defocus", 32, 18, 4, 8, {"qmc": True}),
    ("three_sphere_rr_32x18", "three-sphere", 32, 18, 4, 12, {"rr": 3}),
    ("earth_32x18", "earth", 32, 18, 4, 8, {}),
]


def build_renderer(world, w, h, spp, depth, extra):
    kw = dict(extra)
    if kw.pop("nee", False):
        from myraytracer_tpu.render.lights import extract_lights

        kw["nee_lights"] = extract_lights(world)
    return make_renderer(
        world.camera, w, h, spp, depth, sample_batch=2, sky=world.ambient,
        **kw,
    )


def main(check: bool = False) -> int:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    key = crng.key_from_seed(0)
    rows = [(n, s, w, h, p, d, {}) for n, s, w, h, p, d in CONFIGS]
    rows += EXT_CONFIGS
    failures = []
    for name, scene_name, w, h, spp, depth, extra in rows:
        world = presets.get_scene(scene_name)
        scene = compile_scene(world)
        render = build_renderer(world, w, h, spp, depth, extra)
        img, segs = render(scene, key, 0)
        arr = np.asarray(img)
        if check:
            # Drift check at test_golden's own tolerance (rtol=1e-4):
            # a jax/XLA release that moves CPU fusion by ulps must not
            # fail CI when the tests themselves would pass.
            want = np.load(GOLDEN_DIR / f"{name}.npy")
            ok = arr.shape == want.shape and np.allclose(
                arr, want, rtol=1e-4, atol=1e-5
            )
            print(f"{name}: {'ok' if ok else 'DRIFT'}")
            if not ok:
                failures.append(name)
        else:
            np.save(GOLDEN_DIR / f"{name}.npy", arr)
            print(
                f"{name}: shape={arr.shape} mean={arr.mean():.6f} "
                f"segs={float(segs):.0f}"
            )
    if failures:
        print(f"goldens drifted beyond tolerance: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(check="--check" in sys.argv[1:]))
