"""Hardware-golden table machinery (utils/hwgolden.py).

The digests themselves can only be produced on real TPUs
(tools/tpu_goldens.py, bench.py); these tests pin the pure helpers the
hardware check rides on — hash stability, key shape, table round-trip,
and the match/mismatch/absent verdicts — so the CPU suite catches a
regression in the checking machinery itself.
"""

import numpy as np

from myraytracer_tpu.utils import hwgolden


def test_frame_hash_exact_bits():
    a = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    h1 = hwgolden.frame_hash(a)
    assert h1 == hwgolden.frame_hash(a.copy())  # deterministic
    b = a.copy()
    b[0, 0, 0] = np.nextafter(b[0, 0, 0], 1e9)  # one ulp flips the hash
    assert hwgolden.frame_hash(b) != h1
    # Shape/dtype are part of the digest: same bytes, different layout.
    assert hwgolden.frame_hash(a.reshape(3, 2, 2)) != h1
    assert hwgolden.frame_hash(a.astype(np.float64)) != h1
    # Non-contiguous views hash by content, not memory order.
    c = np.arange(24, dtype=np.float32).reshape(2, 4, 3)[:, ::2, :]
    assert hwgolden.frame_hash(c) == hwgolden.frame_hash(
        np.ascontiguousarray(c)
    )


def test_entry_key_components():
    k = hwgolden.entry_key(
        "final", 1200, 800, 500, 50, "pallas", "TPU v5 lite",
        exec_path="export",
    )
    assert k == "final:1200x800:spp500:d50:pallas:export:TPU v5 lite"
    # The jit/export route is part of the identity (ulp-level divergence).
    assert k != hwgolden.entry_key(
        "final", 1200, 800, 500, 50, "pallas", "TPU v5 lite"
    )


def test_table_roundtrip_and_check(tmp_path):
    path = tmp_path / "hashes.json"
    assert hwgolden.load_table(path) == {}
    digest = hwgolden.frame_hash(np.ones((2, 2, 3), np.float32))
    table = {"k1": hwgolden.make_entry(digest, 1.0, "jit")}
    hwgolden.save_table(table, path)
    loaded = hwgolden.load_table(path)
    assert loaded["k1"]["hash"] == digest
    assert loaded["k1"]["exec_path"] == "jit"
    assert "jax" in loaded["k1"] and "jaxlib" in loaded["k1"]

    status, rec = hwgolden.check("k1", digest, loaded)
    assert status == "match" and rec["hash"] == digest
    status, rec = hwgolden.check("k1", "0" * 64, loaded)
    assert status == "mismatch"
    status, rec = hwgolden.check("nope", digest, loaded)
    assert status == "absent" and rec is None


def test_describe_verdicts():
    import jax

    digest = "a" * 64
    rec_same = {"hash": "b" * 64, "jax": jax.__version__}
    rec_other = {"hash": "b" * 64, "jax": "0.0.1"}
    assert "no recorded hash" in hwgolden.describe("absent", "k", digest, None)
    assert "bitwise match" in hwgolden.describe("match", "k", digest, rec_same)
    same = hwgolden.describe("mismatch", "k", digest, rec_same)
    assert "MISMATCH" in same and "code change" in same
    drift = hwgolden.describe("mismatch", "k", digest, rec_other)
    assert "MISMATCH" in drift and "compiler drift" in drift
