"""Profiling + debugging utilities.

The reference has no tracing/profiling at all (no timestamp queries, no
FPS counter — SURVEY.md §5); this framework provides:

* per-frame structured logging (frame index, accumulated spp, ms/frame,
  Mrays/s) — emitted by the CLI loop;
* ``profile_trace``: a context manager around ``jax.profiler`` that dumps
  xplane traces for xprof/tensorboard;
* ``enable_debug_nans``: the practical "race detector" for a pure
  functional renderer — combined with counter-based RNG every frame is
  bit-reproducible, so any NaN or nondeterminism is immediately
  attributable (SURVEY.md §5, race detection).
"""

from __future__ import annotations

import contextlib
import logging

import jax

log = logging.getLogger("myraytracer_tpu.profiling")


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (xplane) into ``logdir``."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
        log.info("profiler trace started → %s", logdir)
    except Exception as e:  # pragma: no cover - backend-dependent
        started = False
        log.warning("profiler unavailable: %s", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                log.info("profiler trace written to %s", logdir)
            except Exception as e:  # pragma: no cover
                log.warning("profiler stop failed: %s", e)


def enable_debug_nans(enable: bool = True) -> None:
    """Trip on the first NaN anywhere in the pipeline."""
    jax.config.update("jax_debug_nans", bool(enable))
