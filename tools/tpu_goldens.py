"""Record / re-check TPU-hardware bitwise golden hashes.

The determinism contract (same code + key => identical bits on the same
platform; utils/hwgolden.py) is pinned as data so a kernel edit that
silently changes hardware images fails loudly on the next bench run
instead of waiting for an eyeball diff. Run on the real TPU:

    python tools/tpu_goldens.py            # check against the table
    python tools/tpu_goldens.py --record   # (re)record all rows

The headline-scene entry (final 1200x800 spp500 d50, the BASELINE
config bench.py times) is recorded by the bench itself —
`BENCH_RECORD_GOLDEN=1 python bench.py` — so the recorded bits come
from the exact execution path (export-cached renderer) the bench
checks every round.

Rows render one frame through the production session path
(`dispatch.make_session` + `step()`); the plain-jit execution path is
forced (MYRT_EXPORT_CACHE=0) because export-compiled arithmetic may
differ at the ulp level (render/session.py exec-path provenance) — the
exec path is part of each entry's key.
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# Hardware goldens pin the *jit* path; the export path is bench.py's.
os.environ["MYRT_EXPORT_CACHE"] = "0"

import numpy as np

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.utils import hwgolden

# name, scene, config overrides. 256x128 exercises the kernel's real
# block tiling; estimator rows pin the MIS/QMC/RR streams on hardware
# (the CPU-platform goldens in tests/golden/*.npy pin them off-TPU).
ROWS = [
    ("reference", {}),
    ("three-sphere", {}),
    ("defocus", {}),
    ("final", {}),
    ("light", {}),
    ("cornell", {}),
    ("texture", {}),
    ("mesh", dict(samples_per_frame=2)),
    ("earth", dict(backend="jnp")),  # image textures: jnp integrator
    ("cornell", dict(nee=True)),
    ("defocus", dict(qmc=True)),
    ("three-sphere", dict(rr=3, ray_depth=12)),
]

BASE = dict(
    width=256, height=128, samples_per_frame=4, ray_depth=8,
    backend="pallas", seed=0, frame_batch=1,
)


def row_key(scene_name: str, cfg: RenderConfig, device_kind: str) -> str:
    tags = "".join(
        t for t, on in (
            ("+nee", cfg.nee), ("+qmc", cfg.qmc),
            (f"+rr{cfg.rr}", cfg.rr),
        ) if on
    )
    return hwgolden.entry_key(
        scene_name + tags, cfg.width, cfg.height, cfg.samples_per_frame,
        cfg.ray_depth, cfg.backend, device_kind, exec_path="jit",
    )


def main(record: bool) -> int:
    import jax

    if jax.default_backend() != "tpu":
        print(
            "tpu_goldens: hardware goldens are TPU-only "
            f"(platform={jax.default_backend()}); nothing to do"
        )
        return 3

    from myraytracer_tpu.render.dispatch import make_session
    from myraytracer_tpu.scene.presets import get_scene
    from myraytracer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    device_kind = jax.devices()[0].device_kind
    table = hwgolden.load_table()
    failures = []
    for scene_name, overrides in ROWS:
        cfg = RenderConfig(**{**BASE, **overrides})
        key = row_key(scene_name, cfg, device_kind)
        session = make_session(get_scene(scene_name, seed=0), cfg)
        session.step()
        arr = np.asarray(session.framebuffer)
        digest = hwgolden.frame_hash(arr)
        if record:
            table[key] = hwgolden.make_entry(
                digest, arr.mean(), session.exec_path
            )
            print(f"recorded {key}: {digest[:16]}.. mean={arr.mean():.6f}")
        else:
            status, rec = hwgolden.check(key, digest, table)
            print(hwgolden.describe(status, key, digest, rec))
            if status == "mismatch":
                failures.append(key)
    if record:
        hwgolden.save_table(table)
        print(f"wrote {hwgolden.DEFAULT_PATH} ({len(table)} entries)")
    if failures:
        print(f"tpu_goldens: {len(failures)} MISMATCHED rows: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(record="--record" in sys.argv[1:]))
