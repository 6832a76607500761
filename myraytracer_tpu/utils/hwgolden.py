"""TPU-hardware bitwise golden hashes.

The framework's determinism contract — same code + same key => bitwise
identical images on the same platform (the pure-functional analog of the
reference's per-pixel reproducibility; there is no such contract in
`/root/reference`, whose xoshiro state is seeded `from_entropy()`,
raytracer/src/lib.rs:390-395) — was validated on v5e by hand in round 3
but had no automated re-check: a kernel edit that silently changes
hardware images (an FMA contraction, a sweep reorder, an XLA upgrade)
would go unnoticed until someone eyeballed a render.

This module pins that contract as data: `tools/tpu_goldens.py` records a
sha256 per (scene, config, backend, device-kind) on real hardware into
`tests/golden/tpu_hashes.json`, and `bench.py` re-checks the headline
entry every run. A digest depends on device generation AND the compiler,
so each entry carries its jax/jaxlib versions: a mismatch with *equal*
versions is a code regression (fail loudly); with different versions it
is expected drift (re-record via the tool and note it in BENCH.md).

Pure helpers only — no device access — so the table machinery itself is
testable on the CPU suite (tests/test_hwgolden.py).
"""

from __future__ import annotations

import hashlib
import json
import pathlib

import numpy as np

DEFAULT_PATH = (
    pathlib.Path(__file__).resolve().parents[2]
    / "tests" / "golden" / "tpu_hashes.json"
)


def frame_hash(arr) -> str:
    """sha256 of a framebuffer's exact bits (shape+dtype prefixed, so a
    layout change can't alias a pixel change)."""
    a = np.asarray(arr)
    h = hashlib.sha256()
    h.update(f"{a.dtype.str}:{a.shape}:".encode())
    h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def entry_key(
    scene: str, width: int, height: int, spp: int, depth: int,
    backend: str, device_kind: str, exec_path: str = "jit",
) -> str:
    """One golden per rendering contract: the scene/config identify the
    sample stream, backend the compiler path, device_kind the hardware
    (bits differ across TPU generations), exec_path the jit-vs-export
    route (export-compiled arithmetic may differ at the ulp level —
    render/session.py exec-path provenance)."""
    return (
        f"{scene}:{width}x{height}:spp{spp}:d{depth}:{backend}"
        f":{exec_path}:{device_kind}"
    )


def load_table(path=None) -> dict:
    p = pathlib.Path(path or DEFAULT_PATH)
    if not p.exists():
        return {}
    return json.loads(p.read_text())


def save_table(table: dict, path=None) -> None:
    p = pathlib.Path(path or DEFAULT_PATH)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(table, indent=1, sort_keys=True) + "\n")


def make_entry(digest: str, mean: float, exec_path: str = "jit") -> dict:
    import jax
    import jaxlib

    return {
        "hash": digest,
        "mean": round(float(mean), 8),
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "exec_path": exec_path,
    }


def check(key: str, digest: str, table: dict) -> tuple[str, dict | None]:
    """Compare a fresh digest against the table.

    Returns (status, recorded_entry): status is "match", "mismatch" or
    "absent". Version context is the caller's to report — a mismatch
    under a different jax version is drift to re-record, under the same
    version it is a silent image change to treat as a failure.
    """
    rec = table.get(key)
    if rec is None:
        return "absent", None
    return ("match" if rec["hash"] == digest else "mismatch"), rec


def describe(status: str, key: str, digest: str, rec: dict | None) -> str:
    """One loud, self-contained log line for a check result."""
    import jax

    if status == "absent":
        return (
            f"hwgolden: no recorded hash for {key} "
            f"(record with tools/tpu_goldens.py)"
        )
    if status == "match":
        return f"hwgolden: bitwise match for {key}"
    same = rec.get("jax") == jax.__version__
    cause = (
        "SAME jax version — a code change altered hardware bits; "
        "investigate before re-recording"
        if same else
        f"jax {rec.get('jax')} -> {jax.__version__} — compiler drift; "
        f"re-record via tools/tpu_goldens.py and note it in BENCH.md"
    )
    return (
        f"hwgolden: MISMATCH for {key}: got {digest[:16]}.. "
        f"want {rec['hash'][:16]}.. ({cause})"
    )
