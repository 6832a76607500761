"""Cold-start mitigation: persistent compile cache + exported renderers.

The reference pays no compile cost — wgpu pipelines build in milliseconds
(``raytracer/src/lib.rs:986-1068``). The TPU analog is XLA/Mosaic
compilation, and for the fused megakernel it is anything but free: the
driver measured 676 s for compile + first frame of the headline bench
config in round 2 (BENCH_r02.json), with 20-260 s variance on the remote
compile service. Two layers fix it:

1. **Persistent compilation cache** (``enable_persistent_cache``): JAX's
   ``jax_compilation_cache_dir`` keyed on the lowered module. Verified to
   work over the axon remote backend: a warm hit deserializes the compiled
   executable in ~3-4 s instead of recompiling. Every entry point (CLI,
   bench, graft entries) enables it; library users call it explicitly or
   set ``MYRT_CACHE_DIR``. ``MYRT_CACHE=0`` disables.

2. **Exported-renderer cache** (``export_cached_renderer``): the warm-path
   bottleneck left after (1) is *Python tracing + lowering* of the
   megakernel (~10-40 s of single-core host work — the kernel unrolls
   per-chunk sweeps). ``jax.export`` serializes the lowered StableHLO once;
   warm sessions deserialize it (milliseconds) and jit the exported call,
   whose XLA compile then hits the persistent cache. Sessions route through
   the exported artifact on BOTH cold and warm paths so every run executes
   the identical module (bitwise-identical frames, per the determinism
   contract). Entries are keyed on the package source hash, jax version,
   platform/device kind, renderer config, and argument avals — any code or
   config change misses loudly and re-exports.

Cache layout: ``$MYRT_CACHE_DIR`` (default ``~/.cache/myraytracer_tpu``)
with ``xla/`` for the XLA cache and ``export/`` for serialized renderers.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pathlib
from typing import Optional, Sequence

log = logging.getLogger("myraytracer_tpu.cache")

_ENABLED_DIR: Optional[pathlib.Path] = None
_REGISTERED = False


def cache_root() -> Optional[pathlib.Path]:
    """Resolve the cache root (None = caching disabled via MYRT_CACHE=0)."""
    if os.environ.get("MYRT_CACHE") == "0":
        return None
    root = os.environ.get("MYRT_CACHE_DIR")
    if not root:
        root = os.path.join(
            os.path.expanduser("~"), ".cache", "myraytracer_tpu"
        )
    return pathlib.Path(root)


def enable_persistent_cache() -> Optional[pathlib.Path]:
    """Point JAX's persistent compilation cache at the package cache dir.

    Idempotent; safe to call from every entry point. Returns the cache
    root, or None when disabled. Thresholds are lowered so even small
    kernels cache — the remote compile service's latency floor makes
    every avoided compile worth it.
    """
    global _ENABLED_DIR
    root = cache_root()
    if root is None:
        return None
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR
    import jax

    xla_dir = root / "xla"
    xla_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(xla_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ENABLED_DIR = root
    log.debug("persistent compilation cache at %s", xla_dir)
    return root


def _register_serializations() -> None:
    """Register the package's NamedTuple pytrees with jax.export (once)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export

    from myraytracer_tpu.core.vec import V3
    from myraytracer_tpu.scene.compile import (
        CompiledScene,
        CompiledTriangleBVH,
        CompiledTriangles,
    )

    for cls in (V3, CompiledScene, CompiledTriangles, CompiledTriangleBVH):
        export.register_namedtuple_serialization(
            cls, serialized_name=f"myraytracer_tpu.{cls.__name__}"
        )
    _REGISTERED = True


# Subtrees whose sources determine what a renderer computes. cli/viewer/
# output/utils edits never change the lowered module, so they must not
# invalidate export blobs (a stale-blob bug would be silent wrong pixels;
# an over-wide hash is merely a re-export — bias toward the wide side when
# in doubt, but these five plus config.py ARE the compute path).
_COMPUTE_SOURCES = ("core", "kernels", "render", "scene", "parallel")


def code_fingerprint() -> str:
    """Content hash of the package's compute-path Python sources.

    Part of every export-cache key: a stale serialized renderer must never
    survive a code change (the blob embeds compiled-in behavior).
    """
    import myraytracer_tpu

    pkg = pathlib.Path(myraytracer_tpu.__file__).parent
    h = hashlib.sha256()
    paths = [pkg / "config.py"]
    for sub in _COMPUTE_SOURCES:
        paths.extend((pkg / sub).rglob("*.py"))
    for path in sorted(paths):
        h.update(str(path.relative_to(pkg)).encode())
        h.update(path.read_bytes())
    return h.hexdigest()[:16]


def _avals_token(args) -> str:
    import jax

    specs = jax.eval_shape(lambda *a: a, *args)
    return ";".join(
        f"{s.dtype}{list(s.shape)}"
        for s in jax.tree_util.tree_leaves(specs)
    )


def export_cached_renderer(fn, example_args: Sequence, key_parts: Sequence):
    """Return ``(callable, used_export)`` — ``fn`` backed by a serialized
    export when possible.

    Cold path: trace + lower ``fn`` once via ``jax.export``, persist the
    StableHLO blob, and return the jitted exported call (so the persistent
    XLA cache warms on the exact module warm starts will compile). Warm
    path: deserialize the blob — no Python tracing — and jit its call,
    which hits the persistent XLA cache.

    Falls back to ``(jax.jit(fn), False)`` on any export failure (export
    is an optimization, never a correctness dependency). Callers treat
    ``used_export`` as stream provenance: the exported module's compiled
    arithmetic can differ from plain jit's at the ulp level.
    """
    import jax
    from jax import export

    root = cache_root()
    if root is None:
        return jax.jit(fn), False
    _register_serializations()

    backend = jax.default_backend()
    devkind = jax.devices()[0].device_kind
    key = hashlib.sha256(
        "|".join(
            [
                code_fingerprint(),
                jax.__version__,
                backend,
                devkind,
                *[str(p) for p in key_parts],
                _avals_token(example_args),
            ]
        ).encode()
    ).hexdigest()[:24]
    path = root / "export" / f"render-{key}.jaxexport"

    if path.exists():
        try:
            exp = export.deserialize(path.read_bytes())
            log.info("renderer loaded from export cache (%s)", path.name)
            return jax.jit(exp.call), True
        except Exception as e:  # stale/corrupt blob: re-export
            log.warning("export cache read failed (%s); re-exporting", e)
            try:
                path.unlink()
            except OSError:
                pass

    try:
        exp = export.export(jax.jit(fn))(*example_args)
        blob = exp.serialize()
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp-%d" % os.getpid())
        tmp.write_bytes(blob)
        tmp.replace(path)  # atomic: concurrent processes see old or new
        log.info(
            "renderer exported to cache (%s, %d KB)", path.name,
            len(blob) // 1024,
        )
        # Execute the ROUNDTRIPPED export, not the fresh one: a fresh
        # Exported can lower (and therefore cache-key) differently from
        # its deserialized twin, and the cold run must warm the exact XLA
        # cache entry every later run will look up — and run the exact
        # module they run (bitwise stream consistency).
        exp = export.deserialize(blob)
        return jax.jit(exp.call), True
    except Exception as e:
        log.warning("jax.export failed (%s); falling back to plain jit", e)
        return jax.jit(fn), False
