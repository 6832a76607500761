"""Orbit demo: camera animation with zero recompiles (run on the TPU).

The reference is an interactive windowed app; a TPU render would be
useless for that if every camera move cost a 20-260 s Mosaic recompile.
The megakernel therefore reads the thin-lens camera from a packed [19]
f32 runtime operand (``scene.cam``, see render/camera.pack_camera): one
compiled kernel serves every camera. This tool orbits the RTiOW final
scene's camera about the look-at point and reports per-frame wall time —
frame 2+ must run at render speed, not compile speed.

Usage: python tools/orbit.py
Env:   ORBIT_FRAMES (8), ORBIT_SPP (8), ORBIT_WH (480x270),
       ORBIT_OUT (dir for PNGs; unset = no output)
"""

from __future__ import annotations

import math
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.kernels import trace
    from myraytracer_tpu.output.image import to_u8, write_png
    from myraytracer_tpu.render import camera as cam_mod
    from myraytracer_tpu.scene.api import Camera
    from myraytracer_tpu.scene.compile import compile_scene
    from myraytracer_tpu.scene.presets import get_scene

    frames = int(os.environ.get("ORBIT_FRAMES", "8"))
    spp = int(os.environ.get("ORBIT_SPP", "8"))
    wh = os.environ.get("ORBIT_WH", "480x270")
    width, height = (int(x) for x in wh.split("x"))
    out_dir = os.environ.get("ORBIT_OUT")

    world = get_scene("final", seed=0)
    scene = compile_scene(world, spatial_sort=True)
    base = world.camera
    key = crng.key_from_seed(0)

    render = trace.make_renderer(
        base, width, height, spp, 50, material_set=(1, 2, 3), static_ior=1.5,
    )

    la = base.lookat
    lf = base.lookfrom
    radius = math.dist((lf[0], lf[2]), (la[0], la[2]))
    phi0 = math.atan2(lf[2] - la[2], lf[0] - la[0])

    def frame_camera(i):
        phi = phi0 + 2.0 * math.pi * i / frames
        return Camera(
            lookfrom=(
                la[0] + radius * math.cos(phi),
                lf[1],
                la[2] + radius * math.sin(phi),
            ),
            lookat=la, vup=base.vup, vfov_degrees=base.vfov_degrees,
            aperture=base.aperture, focus_dist=base.focus_dist,
        )

    # Compile once (frame 0, forced) ...
    pack0 = cam_mod.pack_camera(frame_camera(0), width, height)
    t0 = time.perf_counter()
    img0, segs0 = render(scene._replace(cam=pack0), key, 0)
    np.asarray(img0)
    print(f"compile+frame 0: {time.perf_counter() - t0:8.1f} ms-equivalent "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # ... then dispatch the whole animation pipelined (each frame a new
    # camera, zero recompiles) and force at the end: the production
    # pattern for batch animation rendering.
    t0 = time.perf_counter()
    handles = [(img0, segs0)]
    for i in range(1, frames):
        pack = cam_mod.pack_camera(frame_camera(i), width, height)
        handles.append(render(scene._replace(cam=pack), key, 0))
    frames_np = [np.asarray(img) for img, _ in handles]  # force in order
    total_segs = sum(float(np.asarray(s)) for _, s in handles)
    dt = time.perf_counter() - t0
    if frames > 1:
        print(
            f"{frames - 1} more frames pipelined: {dt * 1e3:.1f} ms total, "
            f"{dt * 1e3 / (frames - 1):.1f} ms/frame, "
            f"{total_segs / dt / 1e6:.1f} Mrays/s",
            flush=True,
        )
    if out_dir:
        pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
        for i, img_np in enumerate(frames_np):
            write_png(
                pathlib.Path(out_dir) / f"orbit_{i:03d}.png",
                to_u8(img_np, 2.0),
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
