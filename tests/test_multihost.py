"""Two-process multihost integration: real ``jax.distributed`` processes.

test_sharding.py covers the multihost *logic* (spec parsing, allgather
fetch) on one process; this spawns two actual OS processes with separate
JAX runtimes coordinated over localhost — the pod execution model at
miniature scale — and asserts the tile-sharded, allgathered image is
bitwise the single-process render (the determinism contract is
placement-invariant all the way through process boundaries).
"""

import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(out, mode, extra=()):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), f"127.0.0.1:{port}", "2",
             str(pid), str(out), mode, *extra],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=600)
            outs.append((p.returncode, stdout, stderr))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for rc, stdout, stderr in outs:
        assert rc == 0, f"worker failed:\n{stdout}\n{stderr}"
    return np.load(out) if str(out).endswith(".npy") else None


@pytest.mark.slow
def test_two_process_tile_sharded_bitwise(tmp_path):
    got = _run_workers(tmp_path / "multihost.npy", "jnp")

    # Single-process reference on this process's virtual 8-CPU mesh —
    # the same renderer, different process/device placement.
    import jax.numpy as jnp

    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.parallel.sharding import make_tile_sharded_renderer
    from myraytracer_tpu.scene import presets
    from myraytracer_tpu.scene.compile import compile_scene

    world = presets.three_sphere_scene()
    scene = compile_scene(world)
    render = make_tile_sharded_renderer(
        world.camera, 16, 8, 2, 4, sample_batch=2
    )
    want, _ = render(scene, crng.key_from_seed(0), jnp.uint32(0))
    np.testing.assert_array_equal(got, np.asarray(want))


@pytest.mark.slow
def test_two_process_checkpoint_resume_bitwise(tmp_path):
    """Multihost checkpoint/resume through the production CLI (round 4,
    VERDICT item 7): a two-process tile-sharded run saves a checkpoint
    (proc 0 owns the file, the framebuffer fetch is a collective every
    process joins — render/session.py save_checkpoint), a FRESH pair of
    processes resumes it, and the blend chain continues bitwise vs an
    uninterrupted two-process run. Checkpoints carry the full f32 state,
    so the comparison is exact — no quantized-image tolerance.

    No extra provenance (process count, mesh shape) is needed in the
    checkpoint meta: per-pixel sample streams and the blend chain are
    placement-invariant (the bitwise assertions here and in
    test_two_process_tile_sharded_bitwise are the evidence), so a
    checkpoint legitimately resumes under a different device layout.
    """
    ck_a = tmp_path / "a.npz"     # 2 frames, interrupted
    ck_b = tmp_path / "b.npz"     # resumed +2 frames
    ck_c = tmp_path / "c.npz"     # 4 frames, uninterrupted
    _run_workers(tmp_path / "a.png", "cli",
                 ("--frames", "2", "--checkpoint", str(ck_a)))
    _run_workers(tmp_path / "b.png", "cli",
                 ("--frames", "2", "--resume", str(ck_a),
                  "--checkpoint", str(ck_b)))
    _run_workers(tmp_path / "c.png", "cli",
                 ("--frames", "4", "--checkpoint", str(ck_c)))

    b, c = np.load(ck_b), np.load(ck_c)
    assert int(b["frame_count"]) == int(c["frame_count"]) == 4
    assert int(b["sample_cursor"]) == int(c["sample_cursor"])
    np.testing.assert_array_equal(b["framebuffer"], c["framebuffer"])
    # The written images agree too (identical f32 state => identical u8).
    assert (tmp_path / "b.png").read_bytes() == \
        (tmp_path / "c.png").read_bytes()


@pytest.mark.slow
def test_two_process_adaptive_checkpoint_resume_bitwise(tmp_path):
    """Adaptive sampling under --multihost (round 4): a two-process
    stripe-sharded adaptive run checkpoints, a fresh process pair
    resumes it, and the full per-block state (stats, cursors, spp
    allocation) continues bitwise vs an uninterrupted two-process run.
    The final state also matches a single-process session on an
    equal-size (4-device) virtual mesh — the stripe schedule depends
    only on the device COUNT (checkpoint meta ``ndev``), not on how
    devices map to processes."""
    adaptive = ("--adaptive", "4", "--width", "256", "--height", "128")
    ck_a = tmp_path / "a.npz"
    ck_b = tmp_path / "b.npz"
    ck_c = tmp_path / "c.npz"
    _run_workers(tmp_path / "a.png", "cli",
                 adaptive + ("--frames", "4", "--checkpoint", str(ck_a)))
    _run_workers(tmp_path / "b.png", "cli",
                 adaptive + ("--frames", "2", "--resume", str(ck_a),
                             "--checkpoint", str(ck_b)))
    _run_workers(tmp_path / "c.png", "cli",
                 adaptive + ("--frames", "6", "--checkpoint", str(ck_c)))

    b, c = np.load(ck_b), np.load(ck_c)
    assert int(b["rounds"]) == int(c["rounds"])
    assert int(b["samples_spent"]) == int(c["samples_spent"])
    for i in range(6):
        np.testing.assert_array_equal(b[f"state{i}"], c[f"state{i}"])
    assert (tmp_path / "b.png").read_bytes() == \
        (tmp_path / "c.png").read_bytes()

    # Placement invariance: a single-process session over 4 of this
    # process's virtual CPU devices (same stripe count as 2 procs x 2
    # local devices) reproduces the uninterrupted state bitwise.
    import jax
    from jax.sharding import Mesh

    from myraytracer_tpu.config import RenderConfig
    from myraytracer_tpu.render.adaptive import AdaptiveSession

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("tiles",))
    cfg = RenderConfig(
        width=256, height=128, samples_per_frame=2, ray_depth=4,
        backend="jnp", shard="tiles", seed=0,
    )
    from myraytracer_tpu.scene import presets

    sess = AdaptiveSession(
        presets.three_sphere_scene(), cfg, n_sel=4, mesh=mesh
    )
    budget = 6 * cfg.samples_per_frame * 256 * 128
    round_cost = (
        sess.sel_real * sess.block_h * sess.block_w
        * cfg.samples_per_frame * sess.windows
    )
    sess.bootstrap()
    while sess.samples_spent + round_cost <= budget:
        sess.step()
    assert sess.rounds == int(c["rounds"])
    assert sess.samples_spent == int(c["samples_spent"])
    from myraytracer_tpu.parallel.sharding import fetch_array

    for i in range(6):
        np.testing.assert_array_equal(
            fetch_array(sess._state[i]), c[f"state{i}"]
        )


@pytest.mark.slow
def test_two_process_pallas_block_tile_sharded(tmp_path):
    """The megakernel's scalar-prefetch operands and static output layout
    partition under shard_map across REAL process boundaries too (the
    single-process virtual-mesh version is test_sharding.py): the
    allgathered two-process image is bitwise the single-process
    pallas-block render."""
    import functools

    got = _run_workers(tmp_path / "mp.npy", "pallas")

    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.kernels.trace import make_block_renderer
    from myraytracer_tpu.parallel.sharding import make_tile_sharded_renderer
    from myraytracer_tpu.scene import presets
    from myraytracer_tpu.scene.compile import compile_scene

    import jax.numpy as jnp

    world = presets.three_sphere_scene()
    scene = compile_scene(world)
    block = functools.partial(make_block_renderer, tile_rows=8, interpret=True)
    render = make_tile_sharded_renderer(
        world.camera, 16, 8, 2, 4, block_factory=block
    )
    want, _ = render(scene, crng.key_from_seed(0), jnp.uint32(0))
    np.testing.assert_array_equal(got, np.asarray(want))
