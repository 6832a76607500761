"""Subprocess worker for the two-process multihost integration test.

Each worker is a separate OS process with its own JAX runtime: it joins
the coordination service (``jax.distributed.initialize``), sees the
*global* device set (2 local CPU devices x 2 processes = 4), renders the
tile-sharded frame SPMD, and assembles the full image with the allgather
fetch path (``parallel/sharding.fetch_array``). Process 0 writes the
result for the test to compare against the single-process render.

Usage: python multihost_worker.py COORD NPROCS PID OUT.npy [MODE] [ARGS...]

MODE "jnp" (default) shards the oracle block; "pallas" shards the
megakernel (interpret mode off-TPU) — the scalar-prefetch operands and
static output layout must partition under shard_map across REAL process
boundaries, not just the single-process virtual mesh. MODE "cli" drives
the full production entry point (`cli.main`) with `--multihost` plus the
passthrough ARGS — the path the checkpoint/resume integration test uses
(RenderSession save/load under real process boundaries, not just the
bare sharded renderer).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _force_cpu_platform():
    import jax

    # Force CPU before any backend use (this environment presets
    # JAX_PLATFORMS=axon and the plugin wins over env overrides).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    try:
        # Cross-process CPU collectives (the allgather fetch needs them).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older/newer jaxlib: default implementation


def main() -> int:
    coord, nprocs, pid, out = sys.argv[1:5]
    mode = sys.argv[5] if len(sys.argv) > 5 else "jnp"

    import jax

    _force_cpu_platform()

    if mode == "cli":
        # Production path: the CLI initializes jax.distributed itself
        # (--multihost), builds the tile-sharded session via
        # dispatch.make_session, and gates file writes to process 0.
        from myraytracer_tpu import cli

        rc = cli.main([
            "--width", "16", "--height", "8", "--samples-per-frame", "2",
            "--ray-depth", "4", "--scene", "three-sphere",
            "--backend", "jnp", "--shard", "tiles",
            "--multihost", f"{coord},{int(nprocs)},{int(pid)}",
            "--out", out,
            *sys.argv[6:],
        ])
        jax.distributed.shutdown()
        return rc

    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nprocs),
        process_id=int(pid),
    )

    import numpy as np
    import jax.numpy as jnp

    from myraytracer_tpu.core import rng as crng
    from myraytracer_tpu.parallel.sharding import (
        fetch_array,
        make_tile_sharded_renderer,
    )
    from myraytracer_tpu.scene import presets
    from myraytracer_tpu.scene.compile import compile_scene

    assert len(jax.devices()) == 2 * int(nprocs), jax.devices()

    world = presets.three_sphere_scene()
    scene = compile_scene(world)
    if mode == "pallas":
        import functools

        from myraytracer_tpu.kernels.trace import make_block_renderer

        block = functools.partial(
            make_block_renderer, tile_rows=8, interpret=True
        )
        render = make_tile_sharded_renderer(
            world.camera, 16, 8, 2, 4, block_factory=block
        )
    else:
        render = make_tile_sharded_renderer(
            world.camera, 16, 8, 2, 4, sample_batch=2
        )
    img, segs = render(scene, crng.key_from_seed(0), jnp.uint32(0))
    full = fetch_array(img)  # allgather across processes
    assert full.shape[-3:] == (8, 16, 3), full.shape
    assert float(segs) > 0.0
    if int(pid) == 0:
        np.save(out, full)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
