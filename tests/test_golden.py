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


@pytest.mark.parametrize("name,scene_name,w,h,spp,depth", CONFIGS)
def test_golden(name, scene_name, w, h, spp, depth):
    path = GOLDEN_DIR / f"{name}.npy"
    if not path.exists():
        pytest.skip(f"golden {name} not generated (tools/make_goldens.py)")
    want = np.load(path)
    world = presets.get_scene(scene_name)
    scene = compile_scene(world)
    render = make_renderer(
        world.camera, w, h, spp, depth, sample_batch=2,
        sky=world.ambient,
    )
    img, _ = render(scene, KEY, 0)
    np.testing.assert_allclose(np.asarray(img), want, rtol=1e-4, atol=1e-5)
