"""Golden-image regression tests.

Small CPU renders against checked-in arrays (regenerate with
``python tools/make_goldens.py``). The RNG is counter-based so these are
deterministic; tolerance covers XLA fusion/version drift, not sampling
noise. TPU output is covered separately by statistical parity (fp
contraction differs across backends).
"""

import pathlib

import numpy as np
import pytest

from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.render.integrator import make_renderer
from myraytracer_tpu.scene import presets
from myraytracer_tpu.scene.compile import compile_scene

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
KEY = crng.key_from_seed(0)

CONFIGS = [
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


ALL_CONFIGS = [(n, s, w, h, p, d, {}) for n, s, w, h, p, d in CONFIGS]
ALL_CONFIGS += EXT_CONFIGS


@pytest.mark.parametrize("name,scene_name,w,h,spp,depth,extra", ALL_CONFIGS)
def test_golden(name, scene_name, w, h, spp, depth, extra):
    path = GOLDEN_DIR / f"{name}.npy"
    if not path.exists():
        pytest.skip(f"golden {name} not generated (tools/make_goldens.py)")
    want = np.load(path)
    world = presets.get_scene(scene_name)
    scene = compile_scene(world)
    render = build_renderer(world, w, h, spp, depth, extra)
    img, _ = render(scene, KEY, 0)
    np.testing.assert_allclose(np.asarray(img), want, rtol=1e-4, atol=1e-5)
