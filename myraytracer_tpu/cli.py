"""Command-line renderer.

TPU-native analog of the reference's native runner
(``native-runner/src/main.rs:4-43``): same five flags with the same
defaults and the same 0-means-derive size semantics, but headless — instead
of a window accumulating forever, ``--frames`` bounds the progressive loop
and the result is written to ``--out`` (PPM or PNG).

Extensions beyond the reference CLI: scene selection (the reference
hard-codes its 4-sphere world, lib.rs:687-720), seed, backend and sharding
selection, checkpoint/resume, and a per-frame structured log line
(frame index, accumulated spp, ms/frame, Mrays/s) — the reference logs
nothing per frame (SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.output.image import write_image
from myraytracer_tpu.scene.presets import SCENES, get_scene

log = logging.getLogger("myraytracer_tpu")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="myraytracer_tpu",
        description="TPU-native progressive path tracer",
    )
    # Reference flags (native-runner/src/main.rs:20-31), same defaults.
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--height", type=int, default=0)
    p.add_argument("--samples-per-frame", type=int, default=1)
    p.add_argument("--ray-depth", type=int, default=50)
    p.add_argument("--max-framebuffer-weight", type=float, default=1.0)
    # Extensions.
    p.add_argument("--frames", type=int, default=1, help="progressive frames to run")
    p.add_argument(
        "--scene", choices=sorted(SCENES), default="reference",
        help="built-in scene (the reference hard-codes 'reference')",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--obj", default=None, metavar="FILE",
        help="render an OBJ mesh (overrides --scene; native C++ loader)",
    )
    p.add_argument("--out", default="out.png", help=".png or .ppm output path")
    p.add_argument("--gamma", type=float, default=2.0)
    p.add_argument(
        "--backend", choices=["auto", "jnp", "pallas"], default="auto",
        help="integrator backend: pure-jnp oracle or fused Pallas kernel",
    )
    p.add_argument(
        "--shard", choices=["none", "tiles", "samples", "hybrid"], default="none",
        help="multi-chip sharding mode (image tiles or sample-parallel)",
    )
    p.add_argument("--sample-batch", type=int, default=0)
    p.add_argument("--checkpoint", default=None, help="save checkpoint here")
    p.add_argument("--resume", default=None, help="resume from checkpoint")
    p.add_argument("--log-level", default="info")
    p.add_argument(
        "--profile", default=None, metavar="LOGDIR",
        help="capture a jax.profiler (xplane) trace of the render loop",
    )
    p.add_argument(
        "--debug-nans", action="store_true",
        help="trip on the first NaN anywhere in the pipeline",
    )
    p.add_argument(
        "--preview-every", type=int, default=0, metavar="N",
        help="rewrite --out every N frames (progressive preview)",
    )
    p.add_argument(
        "--serve", type=int, default=None, metavar="PORT",
        help="serve the accumulating frame at http://localhost:PORT/ "
        "(the TPU-native analog of the reference's browser runner)",
    )
    p.add_argument(
        "--interactive", action="store_true",
        help="with --serve: drag/wheel in the browser orbits the camera "
        "(runtime camera operand — no recompiles; general-mode scenes)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=getattr(logging, args.log_level.upper()),
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    config = RenderConfig(
        width=args.width,
        height=args.height,
        samples_per_frame=args.samples_per_frame,
        ray_depth=args.ray_depth,
        max_framebuffer_weight=args.max_framebuffer_weight,
        seed=args.seed,
        gamma=args.gamma,
        sample_batch=args.sample_batch,
        backend=args.backend,
        shard=args.shard,
    )
    if args.obj:
        from myraytracer_tpu.scene.presets import obj_scene

        world = obj_scene(args.obj)
    else:
        world = get_scene(args.scene, seed=args.seed)

    from myraytracer_tpu.render.dispatch import make_session

    session = make_session(world, config)
    if args.resume:
        session.load_checkpoint(args.resume)
        log.info(
            "resumed from %s at frame %d (%d spp)",
            args.resume, session.frame_count, session.accumulated_spp,
        )

    w, h = session.width, session.height
    log.info(
        "rendering scene=%s %dx%d spp/frame=%d depth=%d frames=%d backend=%s shard=%s",
        args.scene, w, h, config.samples_per_frame, config.ray_depth,
        args.frames, config.backend, config.shard,
    )

    if args.debug_nans:
        from myraytracer_tpu.utils.profiling import enable_debug_nans

        enable_debug_nans(True)

    import contextlib

    if args.profile:
        from myraytracer_tpu.utils.profiling import profile_trace

        trace_cm = profile_trace(args.profile)
    else:
        trace_cm = contextlib.nullcontext()

    import numpy as np

    viewer = None
    if args.serve is not None:
        from myraytracer_tpu.viewer import LiveViewer

        viewer = LiveViewer(args.serve, gamma=args.gamma)
    if args.interactive and (
        viewer is None or world.camera.reference_mode or args.shard != "none"
    ):
        raise SystemExit(
            "--interactive needs --serve, a general-mode (positionable) "
            "camera scene, and --shard none"
        )

    # With a live viewer, frames are NOT host-synced individually: small
    # frames are dominated by the tunnel round-trip, and JAX pipelines
    # dispatches — so sync (and push to the browser / poll the camera)
    # on a wall-clock cadence instead. Headless runs keep per-frame
    # forcing for honest per-frame timing logs.
    sync_interval = 0.25 if viewer is not None else 0.0
    t_sync = time.perf_counter()
    segs_sync = session.segments_traced
    frames_sync = 0

    with trace_cm:
        for i in range(args.frames):
            fb = session.step()
            frames_sync += 1
            now = time.perf_counter()
            if viewer is not None and now - t_sync < sync_interval and \
                    i != args.frames - 1:
                continue
            np.asarray(fb)  # force the work (block_until_ready may not
            # block on remote-tunnel backends)
            dt = time.perf_counter() - t_sync
            mrays = (session.segments_traced - segs_sync) / dt / 1e6
            log.info(
                "frame=%d spp=%d ms=%.1f (%d frame%s) Mrays/s=%.1f",
                session.frame_count, session.accumulated_spp, dt * 1e3,
                frames_sync, "s" if frames_sync != 1 else "", mrays,
            )
            t_sync = time.perf_counter()
            segs_sync = session.segments_traced
            frames_sync = 0
            if viewer is not None:
                viewer.update(
                    session.framebuffer, session.frame_count,
                    session.accumulated_spp,
                )
                # (Not on the last frame: a move would zero the
                # accumulator with nothing left to refill it before the
                # final image write.)
                if args.interactive and i != args.frames - 1:
                    req = viewer.pending_camera()
                    if req is not None:
                        from myraytracer_tpu.render.camera import orbit_camera

                        session.set_camera(orbit_camera(
                            world.camera,
                            req.get("yaw", 0.0), req.get("pitch", 0.0),
                            req.get("dist", 1.0),
                        ))
                        log.info(
                            "camera orbit yaw=%.2f pitch=%.2f dist=%.2f "
                            "(accumulation reset, no recompile)",
                            req.get("yaw", 0.0), req.get("pitch", 0.0),
                            req.get("dist", 1.0),
                        )
            if args.preview_every and session.frame_count > 0 \
                    and session.frame_count % args.preview_every == 0:
                write_image(args.out, session.framebuffer, gamma=args.gamma)
                log.info("preview → %s", args.out)

    if args.checkpoint:
        session.save_checkpoint(args.checkpoint)
        log.info("checkpoint saved to %s", args.checkpoint)

    write_image(args.out, session.framebuffer, gamma=args.gamma)
    log.info("wrote %s", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
