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


def _denoise_value(s: str):
    """--denoise value: an iteration count, or 'auto' (spp-scheduled —
    render/denoise.py:auto_iterations). argparse type callable."""
    if s.strip().lower() == "auto":
        return "auto"
    try:
        n = int(s)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected an iteration count or 'auto', got {s!r}"
        )
    if n < 0:
        # -1 is strictly an internal viewer sentinel (auto schedule); a
        # negative CLI value must not reach Denoiser(iterations<0).
        raise argparse.ArgumentTypeError(
            "iteration count must be >= 0 (or 'auto')"
        )
    return n


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
    p.add_argument(
        "--frames", type=int, default=1,
        help="progressive frames to run; 0 = accumulate until interrupted "
        "(the reference's unbounded redraw loop, lib.rs:187-196 — Ctrl-C "
        "writes the final image)",
    )
    p.add_argument(
        "--scene", default="reference", metavar="NAME",
        help="built-in scene (the reference hard-codes 'reference'): "
        f"{', '.join(sorted(SCENES))}, mesh:N (N icosphere subdivisions), "
        "or spheres:N (final-scene-style 2Nx2N sphere field)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--nee", action="store_true",
        help="next-event estimation: sample one light per diffuse bounce "
        "(shadow rays; unbiased, ~3-4x less noise at equal spp on the "
        "emissive scenes; extension)",
    )
    p.add_argument(
        "--rr", type=int, default=0, metavar="N",
        help="Russian-roulette termination from bounce N on (survival "
        "p = clamp(max throughput, 0.05, 0.95), 1/p compensation; unbiased; "
        "cuts the deep glass-chain tail — extension)",
    )
    p.add_argument(
        "--qmc", action="store_true",
        help="low-discrepancy camera sampling: scrambled-Sobol sub-pixel "
        "jitter + lens draws (faster convergence per sample; deterministic "
        "and backend/shard invariant like the default stream; extension)",
    )
    p.add_argument(
        "--ambient", default=None, metavar="R,G,B",
        help="constant background color overriding the scene's sky "
        "(e.g. 0,0,0 for emissive-only illumination; extension — the "
        "reference's sky gradient is hard-coded, shader.wgsl:331-334)",
    )
    p.add_argument(
        "--obj", default=None, metavar="FILE",
        help="render an OBJ mesh (overrides --scene; native C++ loader)",
    )
    p.add_argument(
        "--ground", action="store_true",
        help="with --obj: giant ground SPHERE instead of the ground quad "
        "— a mixed sphere+mesh world, which backend=auto can route to "
        "the native CPU path where measured faster (round 5)",
    )
    p.add_argument(
        "--out", default="out.png",
        help=".png/.ppm (u8, --gamma transfer) or .pfm/.npy (raw linear "
        "float HDR) output path",
    )
    from myraytracer_tpu.output.image import parse_gamma

    p.add_argument(
        "--gamma", type=parse_gamma, default=2.0, metavar="G|srgb|aces",
        help="output transfer: float exponent (2.0 = RTiOW sqrt), "
        "'srgb' (the piecewise sRGB encode / inverse EOTF — pixel-exact "
        "with the live reference, which presents through an sRGB "
        "surface, lib.rs:1105-1107), or 'aces' (filmic tonemap — the "
        "Narkowicz ACES fit on unclipped radiance then sRGB encode; "
        "rolls off the >1.0 highlights emissive scenes produce instead "
        "of hard-clipping)",
    )
    p.add_argument(
        "--exposure", type=float, default=1.0, metavar="SCALE",
        help="linear pre-transfer exposure scale for display encodes "
        "(1.0 = neutral, 2.0 = +1 stop; the standard companion to "
        "--gamma aces). Display-side only: .pfm/.npy HDR sinks, AOVs, "
        "and checkpoints always carry the unscaled radiance",
    )
    p.add_argument(
        "--backend", choices=["auto", "jnp", "pallas", "cpu"], default="auto",
        help="integrator backend: pure-jnp oracle, fused Pallas kernel, or "
        "the native C++ SAH-BVH renderer (cpu — large mesh/sphere scenes; "
        "a different sample stream); "
        "when 'auto', the MYRT_BACKEND env var overrides (the analog of "
        "the reference's WGPU_BACKEND override, lib.rs:322)",
    )
    p.add_argument(
        "--shard", choices=["none", "tiles", "samples", "hybrid"], default="none",
        help="multi-chip sharding mode (image tiles or sample-parallel)",
    )
    p.add_argument(
        "--multihost", nargs="?", const="", default=None,
        metavar="HOST:PORT[,NPROCS,PID]",
        help="initialize jax.distributed for a process-spanning mesh "
        "(pod-scale; run one process per host). With no value, "
        "coordination autodetects from the TPU runtime environment. "
        "Combine with --shard; only process 0 writes output.",
    )
    p.add_argument("--sample-batch", type=int, default=0)
    p.add_argument(
        "--frame-batch", type=int, default=0, metavar="K",
        help="progressive frames rendered per kernel call (bitwise "
        "identical to K separate frames; amortizes the in-kernel "
        "regeneration tail — the small-spp throughput fix). Composes "
        "with --shard tiles (not samples/hybrid). 0 = auto: ~64-sample "
        "windows on the Pallas path, 1 with --serve (keeps viewer/orbit "
        "latency low)",
    )
    p.add_argument("--checkpoint", default=None, help="save checkpoint here")
    p.add_argument("--resume", default=None, help="resume from checkpoint")
    p.add_argument(
        "--log-level", default=None,
        help="debug|info|warning|error (default info). When the flag is "
        "absent the MYRT_LOG env var overrides — the analog of the "
        "reference's RUST_LOG/env_logger startup contract "
        "(native-runner/src/main.rs:6-9)",
    )
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
    p.add_argument(
        "--adaptive", type=int, nargs="?", const=0, default=None,
        metavar="BLOCKS",
        help="variance-guided adaptive sampling (extension): spend the "
        "--frames sample budget where the image is still noisy, at "
        "pixel-block granularity (render/adaptive.py). Optional value = "
        "blocks re-rendered per round (default ~1/4 of the grid). "
        "Composes with --frame-batch, --checkpoint/--resume, --shard "
        "tiles (per-device block stripes), --serve (progress view; "
        "no query rebuilds), --interactive (orbit restarts the "
        "schedule), and --multihost (with --shard tiles); not with "
        "--shard samples/hybrid",
    )
    p.add_argument(
        "--denoise", type=_denoise_value, nargs="?", const=0, default=None,
        metavar="ITERS|auto",
        help="edge-avoiding à-trous wavelet denoise of the OUTPUT image "
        "(render/denoise.py; extension): feature-guided reconstruction "
        "from a primary-hit albedo/normal/depth pass — large quality "
        "gains at low spp. Optional value = filter iterations "
        "(default 5; support doubles per iteration), or 'auto' = "
        "iteration count scheduled from the accumulated spp (the "
        "measured ladder, BENCH.md: 5 iters at <=2 spp down to off past "
        "the ~64-spp crossover — progressive renders sharpen to raw as "
        "they converge). A display "
        "transform only: checkpoints keep the raw accumulation and no "
        "sample stream changes. Composes with every backend, --shard, "
        "--adaptive, --serve, and --interactive",
    )
    p.add_argument(
        "--aov", type=str, default=None, metavar="LIST",
        help="comma list from {albedo,normal,depth} (extension): write "
        "arbitrary-output-variable images next to --out as "
        "<stem>.<aov><ext>, from the same deterministic primary-hit "
        "feature pass --denoise uses (render/denoise.py:aux_buffers) — "
        "the guide channels external denoisers (e.g. OIDN) expect. "
        "u8 sinks encode linearly (normal mapped (n+1)/2, depth "
        "t/(1+t)); .pfm/.npy sinks carry the raw float values. With "
        "--serve, also published live at /aov/<name>.png (refreshed on "
        "orbit/session changes)",
    )
    return p


class _DenoiseOnly(Exception):
    """Control flow: a viewer query that only toggles --denoise (the
    serving loop swaps the output filter without a session rebuild)."""


def _make_denoiser(denoise_arg, config, world, width, height):
    """Build the output denoiser, or None.

    ``denoise_arg``: None = off, 0 = default iterations, N >= 1 = N
    iterations, "auto" (or the viewer's -1 sentinel) = spp-scheduled
    iterations (the --denoise CLI contract; the viewer's ?denoise=N
    maps 0 → off). A display transform bound to the world/camera/size
    (the feature pass compiles its own scene — the cpu/C++ backend's
    session never compiles a BVH); applied at every image sink (viewer
    pushes, previews, the final write), never to checkpoints.
    """
    if denoise_arg is None:
        return None
    from myraytracer_tpu.render.denoise import Denoiser

    auto = denoise_arg == "auto" or denoise_arg == -1
    fixed = 0 if auto else denoise_arg
    return Denoiser(
        world, width, height, t_min=config.t_min, t_max=config.t_max,
        auto=auto, **({"iterations": fixed} if fixed else {}),
    )


def _check_routing_prediction(session, mrays: float) -> None:
    """One-shot sanity check of the auto-router's throughput model.

    ``backend=auto``'s CPU routing rests on one host's measured model
    constants (native/cpu_backend.py ``_CPU_MESH``/``_TPU_MESH``): on a
    different CPU generation the crossovers move and the router could
    silently pick the slower path. Compare the first STEADY-state frame
    (the very first sync includes scene build/warmup, so it only arms
    the check) against the prediction and warn loudly on a >3x miss.
    """
    pred = getattr(session, "routing_prediction", None)
    if not pred:
        return
    if not getattr(session, "_route_check_armed", False):
        session._route_check_armed = True  # skip the warmup-polluted sync
        return
    session.routing_prediction = None  # check once
    if mrays > 0 and (mrays < pred / 3.0 or mrays > pred * 3.0):
        log.warning(
            "auto-routing model mispredicted this host: measured %.1f "
            "Mrays/s vs predicted %.1f on the routed backend — the "
            "BENCH.md model anchors may not fit this hardware; consider "
            "an explicit --backend (or MYRT_CPU_THREADS) and re-run",
            mrays, pred,
        )
    else:
        log.info(
            "auto-routing prediction holds: measured %.1f Mrays/s vs "
            "predicted %.1f", mrays, pred,
        )


_AOV_NAMES = ("albedo", "normal", "depth")


def _parse_aov_names(aov_arg):
    """Validate a --aov comma list → channel names (SystemExit on junk)."""
    names = [s.strip().lower() for s in aov_arg.split(",") if s.strip()]
    bad = [n for n in names if n not in _AOV_NAMES]
    if bad:
        raise SystemExit(
            f"--aov: unknown channel(s) {bad}; choose from {_AOV_NAMES}"
        )
    return names


def _aov_feature_pass(config, world, width, height, denoiser=None):
    """The Denoiser whose primary-hit pass sources the AOVs — reuse the
    active --denoise instance when it was built from this world at this
    size, else build one (a size match alone could silently serve stale
    features from another scene)."""
    if denoiser is not None and denoiser.world is world and (
        denoiser.width, denoiser.height
    ) == (width, height):
        return denoiser
    from myraytracer_tpu.render.denoise import Denoiser

    return Denoiser(
        world, width, height, t_min=config.t_min, t_max=config.t_max
    )


def _aov_images(dn, cam, names, hdr=False):
    """name → image dict from the feature pass. ``hdr`` keeps raw float
    values (signed normals, world-unit depth); else display encodes
    (normal (n+1)/2, depth t/(1+t) so sky→~1; albedo is already [0,1])."""
    import numpy as np

    albedo, normal, depth = (np.asarray(a) for a in dn.features(cam))
    out = {}
    for name in names:
        if name == "albedo":
            out[name] = albedo
        elif name == "normal":
            out[name] = normal if hdr else (
                normal * np.float32(0.5) + np.float32(0.5)
            )
        else:
            out[name] = depth if hdr else np.repeat(
                (depth / (1.0 + depth))[..., None], 3, axis=-1
            )
    return out


def _write_aovs(aov_arg, out_path, config, world, width, height,
                cam=None, denoiser=None):
    """Write AOV (arbitrary-output-variable) images next to ``--out``.

    Production renderers ship auxiliary per-pixel channels alongside the
    beauty pass; albedo/normal/depth are the standard guide set (what
    external denoisers consume). Sourced from the one deterministic
    primary-hit pass the in-tree denoiser compiles
    (render/denoise.py:aux_buffers) — reused from ``denoiser`` when
    --denoise is active (same size/world), else compiled here once.
    Encodings per sink (see --aov help): u8 formats get linear encodes
    (gamma 1.0; normal (n+1)/2, depth t/(1+t) so sky→~1); .pfm/.npy get
    the raw float buffers (depth as grayscale Pf).
    """
    import pathlib

    names = _parse_aov_names(aov_arg)
    dn = _aov_feature_pass(config, world, width, height, denoiser)
    out = pathlib.Path(out_path)
    hdr = out.suffix.lower() in (".pfm", ".npy")
    for name, img in _aov_images(dn, cam, names, hdr=hdr).items():
        p = out.with_name(f"{out.stem}.{name}{out.suffix}")
        write_image(p, img, gamma=1.0)
        log.info("aov %s → %s", name, p)


def _run_adaptive(args, config, world) -> int:
    """Adaptive-sampling render loop (see render/adaptive.py).

    ``--frames N`` is the budget of N uniform frames' worth of samples;
    the session reallocates it toward high-variance pixel blocks after a
    two-cover bootstrap.
    """
    import numpy as np

    from myraytracer_tpu.parallel.sharding import fetch_array
    from myraytracer_tpu.render.adaptive import AdaptiveSession

    if args.aov:
        # Fail on a bad channel list NOW — the non-serve path otherwise
        # first touches it in _write_aovs, after the (potentially
        # hours-long) adaptive budget is spent.
        _parse_aov_names(args.aov)

    proc0 = True
    if args.multihost is not None:
        import jax

        proc0 = jax.process_index() == 0

    viewer = None
    if args.serve is not None:
        # Progress viewer: the adaptive state (per-block variance,
        # cursors) is bound to one scene/size for the session's
        # lifetime, so URL-query session rebuilds are rejected. Camera
        # ORBITS compose since round 5: an orbit resets accumulation
        # anyway, so the session restarts its bootstrap + budget on
        # move (AdaptiveSession.set_camera — no recompile).
        from myraytracer_tpu.viewer import LiveViewer

        viewer = LiveViewer(
            args.serve, gamma=args.gamma, exposure=args.exposure
        )
    if args.interactive and (
        viewer is None
        or world.camera.reference_mode
        or args.shard != "none"
    ):
        raise SystemExit(
            "--interactive needs --serve, a general-mode (positionable) "
            "camera scene, and --shard none"
        )

    if args.resume and config.frame_batch == 0:
        # Auto window selection must not invalidate a resume: the saved
        # session's F is provenance (the schedule cadence), so inherit it
        # rather than re-deriving from this run's (possibly different)
        # --frames budget.
        import json as _json

        data = np.load(args.resume, allow_pickle=False)
        saved = _json.loads(str(data["meta"])).get("windows")
        if saved:
            config = config.replace(frame_batch=int(saved))

    session = AdaptiveSession(world, config, n_sel=max(0, args.adaptive))
    denoise = _make_denoiser(
        args.denoise, config, world, session.width, session.height
    )
    if viewer is not None and args.aov:
        # Adaptive cameras are fixed for the session: publish the
        # /aov/<name>.png endpoints once.
        dn = _aov_feature_pass(
            config, world, session.width, session.height, denoise
        )
        viewer.set_aovs(
            _aov_images(dn, None, _parse_aov_names(args.aov))
        )

    def post(fb):
        """Output transform: reads the CURRENT --denoise binding (the
        viewer's live toggle rebinds it); never applied to checkpoints.
        Auto mode schedules off the budget-average spp (adaptive spp is
        per-pixel; the average is the right scale for a global filter).
        The runtime camera operand rides along so the guide features
        follow an --interactive orbit (None on reference-mode scenes —
        the Denoiser's fixed path)."""
        if denoise is None:
            return fb
        spp = session.samples_spent // (session.width * session.height)
        return np.asarray(denoise(fb, session.scene.cam, spp=spp))
    if args.resume:
        session.load_checkpoint(args.resume)
        log.info(
            "resumed adaptive state from %s (%d rounds, %d samples spent)",
            args.resume, session.rounds, session.samples_spent,
        )
    budget = args.frames * config.samples_per_frame * (
        session.width * session.height
    )
    # A resumed run's budget is IN ADDITION to what the checkpoint spent.
    budget += session.samples_spent
    round_cost = (
        session.sel_real * session.block_h * session.block_w
        * config.samples_per_frame * session.windows
    )
    log.info(
        "adaptive render %dx%d spp/round=%d depth=%d budget=%d frames "
        "(%d blocks of %dx%d, %d per round, windows=%d%s) backend=%s "
        "shard=%s x%d",
        session.width, session.height, config.samples_per_frame,
        config.ray_depth, args.frames, session.n_blocks, session.block_w,
        session.block_h, session.n_sel, session.windows,
        "" if config.frame_batch > 0 else " auto", session.backend_resolved,
        config.shard, session.ndev,
    )
    t_sync = time.perf_counter()
    segs_sync = 0.0
    # The bootstrap (two full covers — variance needs two rounds per
    # block) always runs on a FRESH session, even past a tiny budget:
    # every pixel must be rendered at least once for a complete image. A
    # resumed checkpoint that already completed it must not re-pay it.
    if not session.bootstrapped:
        session.bootstrap()
    # Viewer pushes ride the same lazy-sync cadence the streaming loop
    # uses: rounds pipeline device-side, the host syncs (and pushes the
    # current framebuffer to the browser) about once a second.
    sync_interval = 0.25 if viewer is not None else 1.0
    try:
        while session.samples_spent + round_cost <= budget:
            session.step()
            now = time.perf_counter()
            if now - t_sync >= sync_interval:
                fb = fetch_array(session.framebuffer)  # force (honest timing)
                segs = session.segments_traced
                dt = time.perf_counter() - t_sync
                log.info(
                    "rounds=%d spent=%.1f%% of budget Mrays/s=%.1f",
                    session.rounds, 100.0 * session.samples_spent / budget,
                    (segs - segs_sync) / dt / 1e6,
                )
                t_sync, segs_sync = time.perf_counter(), segs
                if viewer is not None:
                    avg_spp = session.samples_spent // (
                        session.width * session.height
                    )
                    viewer.update(
                        post(fb), session.rounds, avg_spp,
                        denoise=denoise.effective_iterations(avg_spp)
                        if denoise else 0,
                        denoise_auto=bool(denoise and denoise.auto),
                        denoise_noise=(denoise.last_noise
                                       if denoise and denoise.auto else None),
                    )
                    if args.interactive:
                        req = viewer.pending_camera()
                        if req is not None:
                            from myraytracer_tpu.render.camera import (
                                orbit_camera,
                            )

                            session.set_camera(orbit_camera(
                                world.camera,
                                req.get("yaw", 0.0), req.get("pitch", 0.0),
                                req.get("dist", 1.0),
                            ))
                            log.info(
                                "camera orbit yaw=%.2f pitch=%.2f dist=%.2f "
                                "(adaptive schedule restarted, no recompile)",
                                req.get("yaw", 0.0), req.get("pitch", 0.0),
                                req.get("dist", 1.0),
                            )
                            if args.aov:
                                # Feature AOVs follow the moved camera (the
                                # packed scene.cam operand). Reuse the
                                # startup feature pass (``dn``) — building a
                                # Denoiser per orbit would re-jit its aux
                                # pass on every mouse move.
                                dn = _aov_feature_pass(
                                    config, world, session.width,
                                    session.height, denoise or dn,
                                )
                                viewer.set_aovs(_aov_images(
                                    dn, session.scene.cam,
                                    _parse_aov_names(args.aov),
                                ))
                    sreq = viewer.pending_session()
                    if sreq is not None:
                        req_dn = sreq.pop("denoise", None)
                        if sreq or req_dn is None:
                            log.warning(
                                "viewer session request ignored: adaptive "
                                "state is bound to one scene/size for the "
                                "session (restart with new flags instead)"
                            )
                        else:
                            # ?denoise=N is a display transform: swap the
                            # output filter; the schedule/accumulation
                            # state is untouched (unlike scene/size, which
                            # the adaptive state is bound to).
                            denoise = _make_denoiser(
                                req_dn if req_dn else None, config, world,
                                session.width, session.height,
                            )
                            log.info(
                                "denoise %s (live toggle, schedule kept)",
                                ("on (auto)" if denoise.auto else
                                 f"on ({denoise.iterations} iters)")
                                if denoise else "off",
                            )
    except KeyboardInterrupt:
        # The uniform loop's graceful-interrupt contract, for the
        # adaptive path too: Ctrl-C falls through to the checkpoint
        # + final image write below with whatever accumulated.
        log.info(
            "interrupted at round %d (%d samples) — writing final "
            "image", session.rounds, session.samples_spent,
        )
    final = fetch_array(session.framebuffer)
    final = post(final)
    if viewer is not None:
        viewer.update(
            final, session.rounds,
            session.samples_spent // (session.width * session.height),
            denoise=denoise.effective_iterations(
                session.samples_spent // (session.width * session.height)
            ) if denoise else 0,
            denoise_auto=bool(denoise and denoise.auto),
            denoise_noise=(denoise.last_noise
                           if denoise and denoise.auto else None),
        )
    smap = session.spp_map
    log.info(
        "adaptive done: rounds=%d samples=%d (%.1f%% of budget) "
        "spp min/mean/max=%d/%.1f/%d",
        session.rounds, session.samples_spent,
        100.0 * session.samples_spent / budget,
        smap.min(), float(smap.mean()), smap.max(),
    )
    if args.checkpoint:
        # Every process joins the state allgather; proc 0 owns the file.
        session.save_checkpoint(args.checkpoint if proc0 else None)
        if proc0:
            log.info("adaptive checkpoint saved to %s", args.checkpoint)
    if proc0:
        write_image(args.out, np.asarray(final), gamma=args.gamma,
                    exposure=args.exposure)
        log.info("wrote %s", args.out)
        if args.aov:
            # cam: the features must follow the FINAL camera (an
            # --interactive orbit may have moved it mid-run).
            _write_aovs(
                args.aov, args.out, config, world,
                session.width, session.height,
                cam=session.scene.cam, denoiser=denoise,
            )
    return 0


def main(argv=None) -> int:
    import os

    args = build_parser().parse_args(argv)
    # Log level: flag > MYRT_LOG env > info — the reference's env_logger
    # honors RUST_LOG-style overrides at startup (native-runner/src/
    # main.rs:6-9); MYRT_LOG is this framework's equivalent.
    level_name = args.log_level or os.environ.get("MYRT_LOG") or "info"
    level = getattr(logging, level_name.upper(), None)
    if not isinstance(level, int):
        raise SystemExit(
            f"unknown log level {level_name!r} (flag --log-level or "
            f"MYRT_LOG env): use debug|info|warning|error"
        )
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    # Persistent XLA compilation cache (+ the sessions' export cache):
    # interactive cold starts were the round-2 defect — the headline
    # kernel compiled for minutes on the remote service. MYRT_CACHE=0
    # opts out entirely, MYRT_EXPORT_CACHE=0 keeps plain jit execution.
    from myraytracer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    # Backend override via environment when the flag is left at auto — the
    # reference honors a WGPU_BACKEND-style env override (lib.rs:322).
    if args.frames < 0:
        raise SystemExit(f"--frames must be >= 0, got {args.frames}")
    backend = args.backend
    if backend == "auto" and os.environ.get("MYRT_BACKEND"):
        backend = os.environ["MYRT_BACKEND"]
        if backend not in ("auto", "jnp", "pallas", "cpu"):
            raise SystemExit(
                f"MYRT_BACKEND={backend!r}: not auto|jnp|pallas|cpu"
            )

    if args.multihost is not None:
        # Before any backend use: after this, jax.devices() is the global
        # (all-host) set and the sharded renderers span the pod.
        from myraytracer_tpu.parallel.sharding import initialize_multihost

        initialize_multihost(args.multihost)

    # A live viewer wants per-frame latency, not batched throughput:
    # auto frame batching drops to 1 under --serve unless overridden.
    frame_batch = args.frame_batch
    if frame_batch == 0 and args.serve is not None:
        frame_batch = 1

    def make_config(**over) -> RenderConfig:
        base = dict(
            width=args.width,
            height=args.height,
            samples_per_frame=args.samples_per_frame,
            ray_depth=args.ray_depth,
            max_framebuffer_weight=args.max_framebuffer_weight,
            seed=args.seed,
            gamma=args.gamma,
            sample_batch=args.sample_batch,
            backend=backend,
            shard=args.shard,
            frame_batch=frame_batch,
            max_frames=max(0, args.frames),
            nee=args.nee,
            qmc=args.qmc,
            rr=max(0, args.rr),
        )
        base.update(over)
        return RenderConfig(**base)

    from myraytracer_tpu.render.dispatch import make_session

    def build_world(scene_name: str, config: RenderConfig):
        if args.obj:
            from myraytracer_tpu.scene.presets import obj_scene

            world = obj_scene(args.obj, ground_sphere=args.ground)
        elif args.ground:
            raise SystemExit("--ground needs --obj (it swaps the OBJ "
                             "scene's ground quad for a sphere)")
        else:
            try:
                world = get_scene(scene_name, seed=config.seed)
            except KeyError as e:
                raise SystemExit(f"--scene: {e.args[0]}") from None
        if args.ambient is not None:
            from myraytracer_tpu.scene.api import World

            try:
                amb = tuple(float(c) for c in args.ambient.split(","))
                if len(amb) != 3 or any(c < 0 for c in amb):
                    raise ValueError
            except ValueError:
                raise SystemExit(
                    f"--ambient: expected R,G,B nonnegative floats, "
                    f"got {args.ambient!r}"
                ) from None
            world = World(
                world.spheres, camera=world.camera, meshes=world.meshes,
                ambient=amb,
            )
        return world

    def build_session(scene_name: str, config: RenderConfig):
        world = build_world(scene_name, config)
        session = make_session(world, config)
        log.info(
            "rendering scene=%s %dx%d spp/frame=%d depth=%d frames=%s "
            "backend=%s shard=%s",
            scene_name, session.width, session.height,
            config.samples_per_frame, config.ray_depth,
            args.frames if args.frames else "unbounded",
            config.backend, config.shard,
        )
        return world, session

    scene_name = args.scene
    config = make_config()

    if args.adaptive is not None:
        # --frame-batch and --checkpoint/--resume compose since round 3
        # (sub-window batching + adaptive-state checkpoints); --shard
        # tiles and --serve since round 4 (per-device block stripes;
        # progress viewer), render/adaptive.py.
        for bad, name in (
            (args.shard not in ("none", "tiles"),
             f"--shard {args.shard} (tile stripes only)"),
            (args.multihost is not None and args.shard != "tiles",
             "--multihost without --shard tiles"),
            (args.multihost is not None and args.serve is not None,
             "--serve under --multihost (the viewer is single-process)"),
            (args.frames == 0, "--frames 0 (needs a bounded budget)"),
        ):
            if bad:
                raise SystemExit(f"--adaptive does not compose with {name}")
        return _run_adaptive(args, config, build_world(scene_name, config))

    world, session = build_session(scene_name, config)
    denoise_arg = args.denoise
    denoise = _make_denoiser(
        denoise_arg, config, world, session.width, session.height
    )

    def post(fb):
        """Output transform: --denoise at every image sink (never on
        checkpoints). Reads the CURRENT session/denoiser bindings, which
        a viewer session rebuild swaps."""
        if denoise is None:
            return fb
        import numpy as np

        return np.asarray(
            denoise(fb, session.scene.cam, spp=session.accumulated_spp)
        )

    if args.resume:
        session.load_checkpoint(args.resume)
        log.info(
            "resumed from %s at frame %d (%d spp)",
            args.resume, session.frame_count, session.accumulated_spp,
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

    from myraytracer_tpu.parallel.sharding import fetch_array

    proc0 = True
    if args.multihost is not None:
        import jax

        proc0 = jax.process_index() == 0

    viewer = None
    if args.serve is not None and args.multihost is not None:
        # The viewer gates host syncs and rebuilds sessions on one
        # process only; the other processes would keep issuing the
        # allgather/psum collectives and deadlock the pod.
        raise SystemExit(
            "--serve is single-process; run the viewer without --multihost"
        )
    if args.serve is not None and proc0:
        from myraytracer_tpu.viewer import LiveViewer

        viewer = LiveViewer(
            args.serve, gamma=args.gamma, exposure=args.exposure
        )
    if args.interactive and (
        viewer is None or world.camera.reference_mode or args.shard != "none"
    ):
        raise SystemExit(
            "--interactive needs --serve, a general-mode (positionable) "
            "camera scene, and --shard none"
        )

    aov_names = _parse_aov_names(args.aov) if args.aov else []
    aov_pass = {}  # cached feature pass for the viewer AOV endpoints

    def push_aovs():
        """Publish /aov/<name>.png to the viewer (--aov with --serve).

        Features are static per camera, so this runs only when the
        camera or session changes (startup, rebuild, orbit) — never per
        frame. The feature pass is cached: rebuilding a Denoiser per
        orbit move would re-jit its aux pass every time.
        """
        if viewer is None or not aov_names:
            return
        dn = denoise
        if dn is None or (dn.width, dn.height) != (
            session.width, session.height
        ):
            dn = aov_pass.get("dn")
            if (dn is None
                    or (dn.width, dn.height) != (session.width, session.height)
                    or aov_pass.get("world") is not world):
                dn = _aov_feature_pass(
                    config, world, session.width, session.height
                )
                aov_pass["dn"], aov_pass["world"] = dn, world
        log.info(
            "publishing /aov/{%s}.png (first call compiles the feature "
            "pass — may take a while on a cold cache)",
            ",".join(aov_names),
        )
        viewer.set_aovs(_aov_images(dn, session.scene.cam, aov_names))
        log.info("aov endpoints live")

    push_aovs()

    # With a live viewer, frames are NOT host-synced individually: small
    # frames are dominated by the tunnel round-trip, and JAX pipelines
    # dispatches — so sync (and push to the browser / poll the camera)
    # on a wall-clock cadence instead. Headless runs keep per-frame
    # forcing for honest per-frame timing logs.
    sync_interval = 0.25 if viewer is not None else 0.0
    t_sync = time.perf_counter()
    segs_sync = session.segments_traced
    frames_sync = 0

    # One loop step = frame_batch progressive frames; --frames counts
    # frames, rounded up to a whole number of steps. (A while loop, not a
    # range: a viewer session rebuild can change frame_batch, so the step
    # count must be re-derived then.)
    n_steps = -(-args.frames // session.frame_batch)

    previews_written = 0
    with trace_cm:
        try:
            i = 0
            while args.frames == 0 or i < n_steps:
                last = args.frames != 0 and i == n_steps - 1
                i += 1
                if viewer is not None and not last:
                    sreq = viewer.pending_session()
                    if sreq is not None:
                        # URL-query render parameters (the reference web
                        # runner's Args-from-query, lib.rs:72-94): rebuild
                        # the session with the merged config. A size/spp/
                        # scene change recompiles, like reloading the
                        # reference page with a new query string. Polled
                        # every frame (a lock peek) — not just on the
                        # sync cadence — so requests apply promptly. A bad
                        # request (unknown scene, malformed values) must
                        # not kill the serving render loop — reject it and
                        # keep the current session, like the reference
                        # page surviving a bad query string.
                        try:
                            from myraytracer_tpu.viewer import (
                                validate_config_bounds,
                            )

                            req_scene = sreq.pop("scene", scene_name)
                            # ?denoise=N: 0 = off, N >= 1 = iterations.
                            # A display transform: a denoise-ONLY query
                            # swaps the output filter in place — no
                            # session rebuild, accumulation continues.
                            req_dn = sreq.pop("denoise", None)
                            if not sreq and req_scene == scene_name \
                                    and req_dn is not None:
                                denoise_arg = req_dn if req_dn else None
                                denoise = _make_denoiser(
                                    denoise_arg, config, world,
                                    session.width, session.height,
                                )
                                log.info(
                                    "denoise %s (live toggle, "
                                    "accumulation kept)",
                                    ("on (auto)" if denoise.auto else
                                     f"on ({denoise.iterations} iters)")
                                    if denoise else "off",
                                )
                                raise _DenoiseOnly
                            req_config = make_config(**sreq)
                            # Bound the merged config, not just the raw
                            # query — e.g. ?width=4096 alone must not
                            # combine with a large CLI height into an
                            # over-budget rebuild (viewer.SESSION_BOUNDS).
                            validate_config_bounds(req_config)
                            world, session = build_session(
                                req_scene, req_config
                            )
                        except _DenoiseOnly:
                            pass
                        except (SystemExit, ValueError, KeyError,
                                TypeError) as e:
                            log.warning(
                                "viewer session request rejected: %s", e
                            )
                        else:
                            scene_name, config = req_scene, req_config
                            if req_dn is not None:
                                denoise_arg = req_dn if req_dn else None
                            denoise = _make_denoiser(
                                denoise_arg, config, world,
                                session.width, session.height,
                            )
                            # The rebuilt session restarts accumulation
                            # (page-reload semantics), so restart the
                            # frame budget under its (possibly different)
                            # frame_batch too.
                            n_steps = -(-args.frames // session.frame_batch)
                            i = 1  # the in-flight step is the 1st
                            push_aovs()  # new scene/size/camera
                        t_sync = time.perf_counter()
                        segs_sync = session.segments_traced
                        frames_sync = 0
                fb = session.step()
                frames_sync += session.frame_batch
                now = time.perf_counter()
                if viewer is not None and now - t_sync < sync_interval \
                        and not last:
                    continue
                fetch_array(fb)  # force the work (block_until_ready may
                # not block on remote-tunnel backends; multi-process
                # shards assemble via allgather — sharding.fetch_array)
                dt = time.perf_counter() - t_sync
                mrays = (session.segments_traced - segs_sync) / dt / 1e6
                log.info(
                    "frame=%d spp=%d ms=%.1f (%d frame%s) Mrays/s=%.1f",
                    session.frame_count, session.accumulated_spp, dt * 1e3,
                    frames_sync, "s" if frames_sync != 1 else "", mrays,
                )
                _check_routing_prediction(session, mrays)
                t_sync = time.perf_counter()
                segs_sync = session.segments_traced
                frames_sync = 0
                if viewer is not None:
                    viewer.update(
                        post(session.framebuffer), session.frame_count,
                        session.accumulated_spp,
                        denoise=denoise.effective_iterations(
                            session.accumulated_spp
                        ) if denoise else 0,
                        denoise_auto=bool(denoise and denoise.auto),
                        denoise_noise=(denoise.last_noise
                                       if denoise and denoise.auto else None),
                    )
                    # (Not on the last frame: a move would zero the
                    # accumulator with nothing left to refill it before
                    # the final image write.)
                    if args.interactive and not last:
                        req = viewer.pending_camera()
                        if req is not None and not world.camera.reference_mode:
                            from myraytracer_tpu.render.camera import (
                                orbit_camera,
                            )

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
                            push_aovs()  # features follow the orbit
                if args.preview_every and session.frame_count > 0 \
                        and session.frame_count // args.preview_every \
                        > previews_written:
                    # Threshold-crossing, not divisibility: frame_count
                    # advances in frame_batch jumps that rarely land on
                    # exact multiples. All processes fetch (collective
                    # under multihost); only proc0 touches the filesystem.
                    previews_written = (
                        session.frame_count // args.preview_every
                    )
                    preview = fetch_array(session.framebuffer)
                    if proc0:
                        write_image(args.out, post(preview), gamma=args.gamma,
                                    exposure=args.exposure)
                        log.info("preview → %s", args.out)
        except KeyboardInterrupt:
            # Graceful exit for the run-forever mode (and any long run):
            # fall through to the checkpoint + final image write below.
            fetch_array(session.framebuffer)
            log.info(
                "interrupted at frame %d (%d spp) — writing final image",
                session.frame_count, session.accumulated_spp,
            )

    if args.checkpoint:
        # Every process participates (the framebuffer fetch is an
        # allgather under multihost); only proc0 writes the file.
        session.save_checkpoint(args.checkpoint if proc0 else None)
        if proc0:
            log.info("checkpoint saved to %s", args.checkpoint)

    final = fetch_array(session.framebuffer)
    if proc0:
        write_image(args.out, post(final), gamma=args.gamma,
                    exposure=args.exposure)
        log.info("wrote %s", args.out)
        if args.aov:
            # The features follow the FINAL camera (an --interactive
            # orbit moves session.scene.cam; reference-mode scenes use
            # the fixed construction camera inside features()).
            _write_aovs(
                args.aov, args.out, config, world,
                session.width, session.height,
                cam=session.scene.cam, denoiser=denoise,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
