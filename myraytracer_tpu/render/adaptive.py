"""Variance-guided adaptive sampling (extension; no reference counterpart).

The reference spreads samples uniformly: every pixel gets
``samples_per_frame`` draws per redraw (``shader.wgsl:378``), so the sky
pixels of the RTiOW final scene get the same budget as the glass ones —
most of the work refines pixels that converged long ago. Adaptive
sampling reallocates the budget: the image is split into the kernel's
native pixel blocks, each block tracks the variance of its per-round
mean estimates, and every round renders only the ``n_sel`` blocks with
the largest expected error reduction.

TPU-first design decisions:

* **Block granularity, static shapes.** The unit of work is the Pallas
  megakernel's own BLOCK_W x block_h pixel tile, and every round renders
  exactly ``n_sel`` of them — one compiled kernel serves all rounds. The
  selected block list and each block's sample cursor are scalar-prefetch
  operands (``kernels/trace.make_adaptive_renderer``), not shapes.
* **Contiguous per-pixel sample streams.** A pixel's n-th sample is the
  same threefry draw no matter when its block was scheduled, so an
  adaptive render of a block is bitwise a uniform render of that block
  at the same per-pixel count (tests/test_adaptive.py) and resolution of
  the estimator stays a plain per-pixel mean — no weights, no bias from
  reordering.
* **Fully on-device rounds.** One jitted call per round computes the
  block scores, selects the top-n_sel blocks (``lax.top_k``), gathers
  their sample cursors, renders them, and folds the sums into the
  framebuffer/variance state — the host never reads a score, so rounds
  pipeline like the streaming frame loop (no per-round tunnel sync).

Scoring: for a block rendered r rounds of k samples, each pixel's
round-means m_i are iid with Var(m) = sigma^2/k, estimated by
S2 = (s2 - s1^2/r)/(r-1). The pixel's current MSE is S2/r; one more
round shrinks it to S2/(r+1), so the expected reduction is
S2/(r(r+1)) — the block score is the pixel mean of that. Blocks with
r < 2 score +inf (the bootstrap covers every block twice first).

Sharding (``config.shard = "tiles"``): the linear block-id space is
partitioned into ``ndev`` contiguous stripes and every device owns one —
its stripe's statistics live in its HBM shard, and each round it scores,
top-k-selects, renders, and folds *its own stripe* under ``shard_map``
with **zero per-round communication** (the scene is replicated; the only
cross-chip movement is the final framebuffer gather). The schedule
policy therefore changes from global top-``n_sel`` to per-stripe
top-``n_sel/ndev`` — each chip spends an equal budget on the worst
blocks of its rows, which also load-balances by construction (a global
top-k could pile every selected block onto one chip's rows). Per-pixel
sample streams are scheduling-independent, so block sums stay bitwise
equal to the unsharded session's at equal per-block schedules
(tests/test_adaptive_sharded.py).

Like any variance-guided stopping rule this trades the uniform
estimator's exact unbiasedness for a data-dependent allocation (pixels
whose early samples looked noisy get more). The estimator per pixel is
still a plain mean of its first n samples; measured bias on the test
scenes is below the reference estimator's own seed noise
(tests/test_adaptive.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.core import rng as crng
from myraytracer_tpu.render import camera as cam_mod
from myraytracer_tpu.render.integrator import render_sample_batch
from myraytracer_tpu.render.lights import extract_lights as _extract_lights
from myraytracer_tpu.scene import api
from myraytracer_tpu.scene.compile import compile_scene


def block_geometry(width, height, block_w, block_h):
    """Block-grid shape for an image: (blocks_x, blocks_y, n_blocks)."""
    bx = -(-width // block_w)
    by = -(-height // block_h)
    return bx, by, bx * by


def make_adaptive_oracle(
    cam,
    width: int,
    height: int,
    n_sel: int,
    max_samples: int,
    ray_depth: int,
    block_w: int,
    block_h: int,
    t_min: float = 1e-3,
    t_max: float = 1e4,
    sky=None,
    nee_lights=None,
    material_set=None,
    static_ior=None,
    texture_set=None,
    qmc: bool = False,
    rr: int = 0,
    windows: int = 1,
):
    """Pure-jnp adaptive block renderer (oracle; CPU path).

    Returns ``render(scene, key, block_ids, samp0) -> (block_sums
    [n_sel, block_h, block_w, 3] f32, segments f32 scalar)``: for each
    selected block, the SUM of radiance over per-pixel sample indices
    ``[samp0[i], samp0[i] + max_samples)``. ``block_ids`` may contain the
    sentinel ``blocks_x * blocks_y`` (one past the grid) for padding —
    sentinel lanes trace nothing and contribute zero. ``windows = F > 1``
    renders F consecutive max_samples-sample sub-windows per block in one
    call and returns per-window sums ``[F, n_sel, bh, bw, 3]`` (matching
    the kernel's frame-bucket composition).

    Same RNG contract as the uniform renderers: a pixel's sample stream
    depends only on (key, pixel, sample index), so adaptive scheduling
    never changes any sample's value.
    """
    del material_set, static_ior, texture_set  # oracle keeps all branches
    # (and reads texture rows straight off the compiled scene)
    del n_sel  # the oracle renders whatever id list it is handed
    blocks_x, _, _ = block_geometry(width, height, block_w, block_h)
    static_gen = cam_mod.make_ray_generator(cam, width, height)
    lanes = block_h * block_w
    spp = int(max_samples)
    windows = int(windows)
    nee_lights = tuple(nee_lights) if nee_lights else None

    def render(scene, key, block_ids, samp0):
        if scene.cam is not None and not cam.reference_mode:
            ray_gen = lambda ix, iy, u1, u2, l1, l2: (  # noqa: E731
                cam_mod.rays_from_packed(
                    scene.cam, width, height, ix, iy, u1, u2, l1, l2
                )
            )
        else:
            ray_gen = static_gen
        bid = jnp.asarray(block_ids, jnp.uint32).astype(jnp.int32)[:, None]
        s0 = jnp.asarray(samp0, jnp.uint32)[:, None]
        local = jnp.arange(lanes, dtype=jnp.int32)[None, :]
        ix = (bid % blocks_x) * block_w + local % block_w
        iy = (bid // blocks_x) * block_h + local // block_w
        in_image = (ix < width) & (iy < height)
        # Sentinel / edge-pad lanes still trace (static shapes); clamp
        # their coordinates so the camera math stays finite, then zero
        # their contribution.
        ixc = jnp.clip(ix, 0, width - 1)
        iyc = jnp.clip(iy, 0, height - 1)
        lane_id = (iyc * width + ixc).astype(jnp.uint32)

        def one_sample(carry, j):
            acc_x, acc_y, acc_z, segs_total = carry
            sample_id = jnp.broadcast_to(s0 + j, (bid.shape[0], lanes))
            rad, segs = render_sample_batch(
                scene, ray_gen, ixc, iyc, lane_id, sample_id, key,
                ray_depth, t_min, t_max, sky=sky,
                lens_draws=not cam.reference_mode, nee_lights=nee_lights,
                qmc=qmc, rr=rr,
            )
            w = in_image.astype(jnp.float32)
            return (
                acc_x + rad.x * w,
                acc_y + rad.y * w,
                acc_z + rad.z * w,
                segs_total + jnp.sum(segs.astype(jnp.float32) * w),
            ), None

        zero = jnp.zeros((bid.shape[0], lanes), jnp.float32)

        def one_window(segs_total, wdx):
            (ax, ay, az, segs_w), _ = jax.lax.scan(
                one_sample, (zero, zero, zero, jnp.float32(0.0)),
                wdx * jnp.uint32(spp) + jnp.arange(spp, dtype=jnp.uint32),
            )
            sums = jnp.stack([ax, ay, az], axis=-1)
            return segs_total + segs_w, sums.reshape(
                bid.shape[0], block_h, block_w, 3
            )

        if windows == 1:
            segs, sums = one_window(jnp.float32(0.0), jnp.uint32(0))
            return sums, segs
        segs, sums = jax.lax.scan(
            one_window, jnp.float32(0.0),
            jnp.arange(windows, dtype=jnp.uint32),
        )
        return sums, segs  # [windows, n_sel, bh, bw, 3]

    return render


# --- on-device statistics (one jitted scatter per round) -------------------


@jax.jit
def _update_stats(fbB, s1, s2, n_b, r_b, cursor, idx, sums, k):
    """Fold one round's block sums into the running state.

    fbB  [n_blocks+1, bh, bw, 3]  per-pixel running mean
    s1/s2 [n_blocks+1, bh, bw]    sums of per-round mean luminance (and sq)
    n_b/r_b [n_blocks+1]          per-block sample / round counts
    cursor [n_blocks+1] u32       per-block sample-index cursors
    idx  [n_sel] i32              selected block indices (sentinel rows
                                  land in the spare last slot)
    sums [n_sel, bh, bw, 3]       radiance sums of this round
    k    i32                      samples per pixel this round

    The scatter is a one-hot MXU matmul + dense blend, NOT ``.at[idx]``:
    XLA lowers these block-row scatters serially on TPU (measured ~350 ms
    per round at 1200x800 — 100x the trace time of the round), while the
    [nb1, n_sel] x [n_sel, bh*bw*3] one-hot product plus an elementwise
    select is ~1 ms of MXU/HBM work. Values are exact: real block ids are
    unique per round, so each output element sums exactly one product.
    """
    nb1 = fbB.shape[0]
    kf = k.astype(jnp.float32)
    onehot = (
        idx[None, :] == jnp.arange(nb1, dtype=jnp.int32)[:, None]
    ).astype(jnp.float32)  # [nb1, n_sel]
    sel = jnp.minimum(onehot.sum(axis=1), 1.0)  # sentinel pads can repeat
    scattered = (onehot @ sums.reshape(sums.shape[0], -1)).reshape(
        (nb1,) + sums.shape[1:]
    )  # zeros on unselected rows
    n_old = n_b.astype(jnp.float32)[:, None, None, None]
    pick = sel[:, None, None, None] > 0.0
    fbB = jnp.where(pick, (fbB * n_old + scattered) / (n_old + kf), fbB)
    lum = jnp.mean(scattered, axis=-1) / kf  # round-mean luminance (0 off-sel)
    s1 = s1 + lum
    s2 = s2 + lum * lum
    seli = sel.astype(jnp.int32)
    n_b = n_b + k * seli
    r_b = r_b + seli
    cursor = cursor + (k * seli).astype(jnp.uint32)
    return fbB, s1, s2, n_b, r_b, cursor


@jax.jit
def _block_scores(s1, s2, r_b):
    """Expected per-pixel MSE reduction of re-rendering each block.

    Blocks with r < 2 rounds score +inf (must bootstrap); the spare
    sentinel row is excluded by the caller (it slices [:n_blocks]).
    """
    r = r_b.astype(jnp.float32)[:, None, None]
    var_m = (s2 - s1 * s1 / jnp.maximum(r, 1.0)) / jnp.maximum(r - 1.0, 1.0)
    var_m = jnp.maximum(var_m, 0.0)  # cancellation can go tiny-negative
    score = jnp.mean(var_m, axis=(1, 2)) / (
        jnp.maximum(r[:, 0, 0], 1.0) * (r[:, 0, 0] + 1.0)
    )
    return jnp.where(r_b < 2, jnp.float32(jnp.inf), score)


class AdaptiveSession:
    """Adaptive-budget render session.

    Unlike :class:`render.session.RenderSession` (the reference's uniform
    progressive loop), a step renders ``n_sel`` chosen blocks of
    ``samples_per_frame`` samples each. ``run_budget(total)`` spends a
    total per-image sample budget (in units of uniform frames) and
    returns the framebuffer. Sessions checkpoint/resume exactly (the
    per-block statistics and cursors round-trip — round 3). Tile
    sharding composes (``config.shard = "tiles"``): each device owns a
    contiguous stripe of block ids, keeps that stripe's statistics in
    its own HBM shard, and schedules per-stripe top-k rounds with zero
    per-round communication (module docstring). The camera is fixed for
    the session's lifetime (accumulation assumes one view).
    """

    def __init__(
        self,
        world: api.World,
        config: RenderConfig = RenderConfig(),
        n_sel: int = 0,
        renderer_factory=None,
        interpret: bool = False,
        mesh=None,
    ):
        if config.shard not in ("none", "tiles"):
            raise ValueError(
                "adaptive sampling shards over image tiles only: the "
                "sample/hybrid modes would split each block's sample "
                "window across devices, which the per-block cursors do "
                "not describe; use shard='none' or shard='tiles'"
            )
        self.world = world
        self.config = config
        self.width, self.height = config.resolve_size()
        resolved = config.backend
        if resolved == "auto":
            resolved = "pallas" if jax.default_backend() == "tpu" else "jnp"
        if resolved == "cpu":
            raise ValueError(
                "adaptive sampling runs on the jnp/pallas backends (the "
                "native cpu path has no block renderer); use backend "
                "'auto', 'jnp' or 'pallas'"
            )
        self.backend_resolved = resolved

        from myraytracer_tpu.kernels import trace as ktrace

        kc = ktrace.DEFAULT_CONFIG
        self.block_w = kc.BLOCK_W
        self.block_h = ktrace.DEFAULT_TILE_ROWS * ktrace.LANES // kc.BLOCK_W
        self.blocks_x, self.blocks_y, self.n_blocks = block_geometry(
            self.width, self.height, self.block_w, self.block_h
        )
        self.sentinel = self.n_blocks  # one-past-grid block id: renders nothing

        if config.shard == "tiles":
            from myraytracer_tpu.parallel import sharding as shmod

            self.mesh = mesh if mesh is not None else shmod.default_mesh()
            self.ndev = int(self.mesh.shape["tiles"])
        else:
            self.mesh = None
            self.ndev = 1
        if n_sel <= 0:
            n_sel = max(1, self.n_blocks // 4)
        n_sel = min(n_sel, self.n_blocks)
        # Device d owns the contiguous block-id stripe
        # [d*local_nb, (d+1)*local_nb) ∩ [0, n_blocks); ids past the grid
        # are dead (scheduled as the sentinel). Per-stripe selection picks
        # n_sel_local blocks per device per round.
        self.local_nb = -(-self.n_blocks // self.ndev)
        self.n_sel_local = min(-(-n_sel // self.ndev), self.local_nb)
        self.n_sel = self.n_sel_local * self.ndev
        # Real (non-dead) blocks selected per auto round — dead stripe
        # padding on the last device selects the sentinel instead.
        self.sel_real = sum(
            min(self.n_sel_local,
                max(0, min(self.local_nb, self.n_blocks - d * self.local_nb)))
            for d in range(self.ndev)
        )

        self.scene = compile_scene(
            world,
            spatial_sort=len(world.spheres) > 64 or world.triangle_count > 64,
            triangle_bvh=(resolved == "jnp" and world.triangle_count > 512),
        )
        if not world.camera.reference_mode:
            self.scene = self.scene._replace(
                cam=jnp.asarray(
                    cam_mod.pack_camera(world.camera, self.width, self.height)
                )
            )
        self.key = crng.key_from_seed(config.seed)

        materials = {s.material.type_id for s in world.spheres}
        materials |= {m.material.type_id for m in world.meshes}
        iors = {s.material.ior for s in world.spheres if s.material.type_id == 3}
        iors |= {m.material.ior for m in world.meshes if m.material.type_id == 3}
        kwargs = dict(
            t_min=config.t_min, t_max=config.t_max,
            material_set=tuple(sorted(materials)) or None,
            static_ior=(iors.pop() if len(iors) == 1 else None),
            sky=world.ambient,
            nee_lights=_extract_lights(world) if config.nee else None,
            qmc=config.qmc,
            rr=config.rr,
            texture_set=world.texture_set or None,
        )
        # Sub-window batching (round 3): one kernel call renders
        # `windows` consecutive spp-sample sub-windows per selected block
        # — the uniform frame-batching win applied to adaptive rounds
        # (shared regeneration tail) with per-window sums feeding the
        # variance statistics at single-window resolution. Auto policy
        # (round 4): the measured ~128-sample-window knee on the Pallas
        # path, budget-bounded (config.resolve_adaptive_windows);
        # config.frame_batch overrides.
        self.windows = config.resolve_adaptive_windows(resolved)
        if renderer_factory is not None:
            factory = renderer_factory
        elif resolved == "pallas":
            factory = lambda **kw: ktrace.make_adaptive_renderer(  # noqa: E731
                interpret=interpret, **kw
            )
        else:
            factory = lambda **kw: jax.jit(make_adaptive_oracle(  # noqa: E731
                block_w=self.block_w, block_h=self.block_h, **kw
            ))
        self._render = factory(
            cam=world.camera, width=self.width, height=self.height,
            n_sel=self.n_sel_local, max_samples=config.samples_per_frame,
            ray_depth=config.ray_depth, windows=self.windows, **kwargs,
        )

        nb1 = self.local_nb + 1  # spare row absorbs sentinel scatters
        bshape = (nb1, self.block_h, self.block_w)
        lead = (self.ndev,) if self.ndev > 1 else ()
        self._state = (
            jnp.zeros(lead + bshape + (3,), jnp.float32),  # fbB: pixel mean
            jnp.zeros(lead + bshape, jnp.float32),  # s1: sum of round means
            jnp.zeros(lead + bshape, jnp.float32),  # s2: sum of sq round means
            jnp.zeros(lead + (nb1,), jnp.int32),  # n_b: per-block samples
            jnp.zeros(lead + (nb1,), jnp.int32),  # r_b: per-block rounds
            jnp.zeros(lead + (nb1,), jnp.uint32),  # cursor: sample start
        )
        self.rounds = 0
        self.samples_spent = 0  # total per-pixel samples x pixels rendered
        self._bootstrapped = False
        self._segs_pending = []
        self._segs_total = 0.0

        k = self.config.samples_per_frame
        n_blocks, n_sel_static = self.n_blocks, self.n_sel_local
        local_nb = self.local_nb
        F = self.windows

        def fold_round(state, lidx, render_ids, scene, key):
            """Render ``render_ids`` (global ids; sentinel allowed) and
            fold the F sub-window sums into the local statistics rows
            ``lidx`` (spare row ``local_nb`` for sentinels). The windows
            are consecutive sample ranges off the same cursor, so the
            fold order is the sample order — bitwise what F separate
            rounds produce."""
            samp0 = state[5][lidx]  # sentinel reads the (unused) spare slot
            sums, segs = self._render(scene, key, render_ids, samp0)
            if F == 1:
                sums = sums[None]

            def fold(st, sums_w):
                return _update_stats(*st, lidx, sums_w, jnp.int32(k)), None

            state, _ = jax.lax.scan(fold, state, sums)
            return state, segs

        if self.ndev == 1:

            def round_ids(scene, key, state, ids_u32):
                """One call = F sub-rounds of the given block ids."""
                idx = jnp.minimum(ids_u32.astype(jnp.int32), n_blocks)
                return fold_round(state, idx, ids_u32, scene, key)

            def round_auto(scene, key, state):
                """One fully on-device adaptive round: score, select
                top-n_sel, render, update. No host syncs — rounds
                pipeline."""
                _, s1, s2, _, r_b, _ = state
                scores = _block_scores(s1, s2, r_b)[:n_blocks]
                _, top = jax.lax.top_k(scores, n_sel_static)
                return round_ids(scene, key, state, top.astype(jnp.uint32))

            self._round_ids = jax.jit(round_ids)
            self._round_auto = jax.jit(round_auto)
        else:
            # Sharded rounds: each device squeezes out its own stripe of
            # the [ndev, ...] state, renders/folds locally, and never
            # communicates — the per-pixel RNG streams are global, so a
            # block renders identically no matter which device owns it.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from myraytracer_tpu.parallel.sharding import (
                shard_map as _shard_map,
            )

            self._state = tuple(
                jax.device_put(a, NamedSharding(self.mesh, P("tiles")))
                for a in self._state
            )

            def local_ids(scene, key, state, ids_u32):
                state = jax.tree_util.tree_map(lambda a: a[0], state)
                gid = ids_u32[0].astype(jnp.int32)
                base = jax.lax.axis_index("tiles").astype(
                    jnp.int32
                ) * jnp.int32(local_nb)
                owned = (gid >= base) & (
                    gid < jnp.minimum(base + local_nb, n_blocks)
                )
                lidx = jnp.where(owned, gid - base, jnp.int32(local_nb))
                render_ids = jnp.where(
                    owned, ids_u32[0], jnp.uint32(n_blocks)
                )
                state, segs = fold_round(state, lidx, render_ids, scene, key)
                return (
                    jax.tree_util.tree_map(lambda a: a[None], state),
                    segs[None],
                )

            def local_auto(scene, key, state):
                st = jax.tree_util.tree_map(lambda a: a[0], state)
                _, s1, s2, _, r_b, _ = st
                scores = _block_scores(s1, s2, r_b)[:local_nb]
                base = jax.lax.axis_index("tiles").astype(
                    jnp.int32
                ) * jnp.int32(local_nb)
                alive = (
                    base + jnp.arange(local_nb, dtype=jnp.int32)
                ) < n_blocks
                scores = jnp.where(alive, scores, -jnp.inf)
                _, top = jax.lax.top_k(scores, n_sel_static)
                gids = jnp.where(
                    alive[top],
                    (base + top).astype(jnp.uint32),
                    jnp.uint32(n_blocks),
                )
                lidx = jnp.where(alive[top], top, jnp.int32(local_nb))
                state, segs = fold_round(st, lidx, gids, scene, key)
                return (
                    jax.tree_util.tree_map(lambda a: a[None], state),
                    segs[None],
                )

            self._round_ids = jax.jit(_shard_map(
                local_ids, mesh=self.mesh,
                in_specs=(P(), P(), P("tiles"), P("tiles")),
                out_specs=(P("tiles"), P("tiles")),
            ))
            self._round_auto = jax.jit(_shard_map(
                local_auto, mesh=self.mesh,
                in_specs=(P(), P(), P("tiles")),
                out_specs=(P("tiles"), P("tiles")),
            ))

    # -- internals ----------------------------------------------------------

    def set_camera(self, cam: api.Camera) -> None:
        """Move the runtime camera and restart the adaptive schedule.

        The adaptive state (per-block variance moments, round counts,
        accumulation) describes ONE view — an orbit invalidates all of
        it, so the move zeroes the statistics and re-arms the bootstrap;
        the caller's budget loop restarts (the CLI's interactive path
        runs this under the viewer's bounded-rebuild guard). Like
        RenderSession.set_camera this is a ~µs repack of the packed
        [19]-f32 ``scene.cam`` operand — no recompile — and the sample
        stream CONTINUES from the per-block cursors (kept), so no draws
        are ever reused across views.
        """
        if cam.reference_mode or self.world.camera.reference_mode:
            raise ValueError(
                "the reference-mode camera is fixed by contract; "
                "use a general (lookfrom/lookat) camera scene to move"
            )
        self.scene = self.scene._replace(
            cam=jnp.asarray(
                cam_mod.pack_camera(cam, self.width, self.height)
            )
        )
        fbB, s1, s2, n_b, r_b, cursor = self._state
        self._state = (
            jnp.zeros_like(fbB), jnp.zeros_like(s1), jnp.zeros_like(s2),
            jnp.zeros_like(n_b), jnp.zeros_like(r_b), cursor,
        )
        self.rounds = 0
        self.samples_spent = 0
        self._bootstrapped = False

    def _check_cursor_headroom(self, extra_calls: int = 1) -> None:
        # Worst case, one block absorbed every sub-round so far plus the
        # next call's F windows: its cursor is bounded by
        # (rounds + extra*F) * k. Host-side counters only — no device sync.
        k = self.config.samples_per_frame
        worst = (self.rounds + extra_calls * self.windows) * k
        # QMC reserves the top draw words for its per-pixel scramble
        # derivation — mirror RenderSession.step's tightened cap.
        cap = 0xFFFFFFFF - (crng.QMC_SCRAMBLE_SLOTS if self.config.qmc else 0)
        if worst * crng.DRAWS_PER_SAMPLE > cap:
            raise RuntimeError(
                "per-pixel sample cursor could overflow the uint32 "
                "draw-index space: the RNG stream would alias"
            )

    def bootstrap(self, covers: int = 2) -> None:
        """Render every block until it has >= ``covers`` statistics
        rounds (variance needs r >= 2). One call contributes F windows,
        so the default F >= 2 bootstraps in a single pass over the
        grid — half the round-1 bootstrap's calls."""
        k = self.config.samples_per_frame
        chunks = -(-self.local_nb // self.n_sel_local)
        for _ in range(-(-covers // self.windows)):
            for c in range(chunks):
                # Chunk c of every device's stripe, in one call. ids past
                # a stripe's real blocks (chunk overrun, or grid padding
                # on the last stripe) schedule the sentinel.
                ids = np.empty((self.ndev, self.n_sel_local), np.int64)
                for d in range(self.ndev):
                    stripe_end = min(
                        (d + 1) * self.local_nb, self.n_blocks
                    )
                    cand = (
                        d * self.local_nb + c * self.n_sel_local
                        + np.arange(self.n_sel_local, dtype=np.int64)
                    )
                    cand[cand >= stripe_end] = self.sentinel
                    ids[d] = cand
                n_real = int((ids != self.sentinel).sum())
                if n_real == 0:
                    continue
                ids_dev = jnp.asarray(
                    ids if self.ndev > 1 else ids[0], jnp.uint32
                )
                self._check_cursor_headroom()
                self._state, segs = self._round_ids(
                    self.scene, self.key, self._state, ids_dev
                )
                self.rounds += self.windows
                self.samples_spent += (
                    n_real * self.block_h * self.block_w * k * self.windows
                )
                self._segs_pending.append(segs)
        self._bootstrapped = True

    def step(self) -> None:
        """One adaptive round: score, select top-n_sel, render, update."""
        if not self._bootstrapped:
            self.bootstrap()
            return
        self._check_cursor_headroom()
        self._state, segs = self._round_auto(self.scene, self.key, self._state)
        self.rounds += self.windows
        self.samples_spent += (
            self.sel_real * self.block_h * self.block_w
            * self.config.samples_per_frame * self.windows
        )
        self._segs_pending.append(segs)

    def run_budget(self, uniform_frames: int) -> jnp.ndarray:
        """Spend the sample budget of ``uniform_frames`` uniform frames
        (bootstrap included), then return the framebuffer."""
        budget = (
            int(uniform_frames) * self.config.samples_per_frame
            * self.width * self.height
        )
        round_cost = (
            self.sel_real * self.block_h * self.block_w
            * self.config.samples_per_frame * self.windows
        )
        while self.samples_spent + round_cost <= budget:
            self.step()
        return self.framebuffer

    # -- checkpoint / resume ---------------------------------------------------

    def save_checkpoint(self, path) -> None:
        """Save the adaptive state (per-block stats + cursors) to npz.

        Same provenance discipline as RenderSession: scene fingerprint,
        backend, estimator flags, and the adaptive geometry (block grid,
        n_sel, windows) — the resumed session must continue the exact
        per-pixel sample streams and fold statistics identically.

        ``path=None`` participates in the state gather without writing a
        file — under ``--multihost`` the stripe-sharded state assembles
        with an allgather every process must join, while only process 0
        owns the file (the RenderSession.save_checkpoint contract).
        """
        import json
        import pathlib

        from myraytracer_tpu.render.session import (
            CHECKPOINT_VERSION, scene_fingerprint,
        )

        meta = {
            "version": CHECKPOINT_VERSION,
            "adaptive": True,
            "width": self.width,
            "height": self.height,
            "samples_per_frame": self.config.samples_per_frame,
            "ray_depth": self.config.ray_depth,
            "seed": self.config.seed,
            "t_min": self.config.t_min,
            "t_max": self.config.t_max,
            "nee": self.config.nee,
            "nee_estimator": "mis" if self.config.nee else None,
            "qmc": self.config.qmc,
            "rr": self.config.rr,
            "scene": scene_fingerprint(self.scene),
            "backend": self.backend_resolved,
            "n_sel": self.n_sel,
            "windows": self.windows,
            "block_w": self.block_w,
            "block_h": self.block_h,
            "shard": self.config.shard,
            "ndev": self.ndev,
        }
        # fetch_array, not np.asarray: the stripe-sharded state spans
        # processes under --multihost and a plain host read of
        # non-addressable shards raises (parallel/sharding.fetch_array).
        from myraytracer_tpu.parallel.sharding import fetch_array

        arrays = {
            f"state{i}": fetch_array(a) for i, a in enumerate(self._state)
        }
        arrays.update(
            rounds=np.int64(self.rounds),
            samples_spent=np.int64(self.samples_spent),
            segments_traced=np.float64(self.segments_traced),
            meta=json.dumps(meta),
        )
        if self.scene.cam is not None:
            # The runtime camera operand: an --interactive orbit may have
            # moved it (set_camera), and the accumulated state describes
            # THAT view — resuming under the construction camera would
            # silently blend two views (the RenderSession "camera"
            # checkpoint contract, session.py).
            arrays["camera"] = np.asarray(self.scene.cam)
        if path is not None:
            np.savez(pathlib.Path(path), **arrays)

    def load_checkpoint(self, path) -> None:
        import json
        import pathlib

        from myraytracer_tpu.render.session import (
            CHECKPOINT_VERSION, scene_fingerprint,
        )

        data = np.load(pathlib.Path(path), allow_pickle=False)
        meta = json.loads(str(data["meta"]))
        if meta.get("version") != CHECKPOINT_VERSION:
            raise ValueError(
                f"checkpoint version {meta.get('version')} unsupported"
            )
        if not meta.get("adaptive"):
            raise ValueError(
                "not an adaptive checkpoint (uniform sessions resume via "
                "RenderSession.load_checkpoint)"
            )
        want = {
            "width": self.width,
            "height": self.height,
            "samples_per_frame": self.config.samples_per_frame,
            "ray_depth": self.config.ray_depth,
            "seed": self.config.seed,
            "t_min": self.config.t_min,
            "t_max": self.config.t_max,
            "nee": self.config.nee,
            "nee_estimator": "mis" if self.config.nee else None,
            "qmc": self.config.qmc,
            "rr": self.config.rr,
            "scene": scene_fingerprint(self.scene),
            "backend": self.backend_resolved,
            "n_sel": self.n_sel,
            "windows": self.windows,
            "block_w": self.block_w,
            "block_h": self.block_h,
            # Stripe ownership depends on the device count, so a sharded
            # checkpoint resumes on an equal-size mesh only (pre-round-4
            # checkpoints were always unsharded).
            "shard": self.config.shard,
            "ndev": self.ndev,
        }
        defaults = {"shard": "none", "ndev": 1}
        for k, v in want.items():
            if meta.get(k, defaults.get(k)) != v:
                raise ValueError(
                    f"checkpoint {k}={meta.get(k)!r} != session {v!r}"
                )
        state = tuple(
            jnp.asarray(data[f"state{i}"]) for i in range(len(self._state))
        )
        if self.ndev > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            state = tuple(
                jax.device_put(a, NamedSharding(self.mesh, P("tiles")))
                for a in state
            )
        self._state = state
        self.rounds = int(data["rounds"])
        self.samples_spent = int(data["samples_spent"])
        self._segs_total = float(data["segments_traced"])
        self._segs_pending = []
        if "camera" in getattr(data, "files", ()):
            # Resume under the checkpoint's (possibly orbited) camera.
            self.scene = self.scene._replace(
                cam=jnp.asarray(data["camera"])
            )
        # Every block with r >= 2 has usable variance; resume skips the
        # bootstrap iff the saved run completed it. Read from the file,
        # not the (possibly process-spanning) device arrays.
        r_b = np.asarray(data["state4"])
        if self.ndev > 1:
            r_b = r_b[:, : self.local_nb].reshape(-1)
        self._bootstrapped = bool((r_b[: self.n_blocks] >= 2).all())

    # -- outputs --------------------------------------------------------------

    @property
    def bootstrapped(self) -> bool:
        """True once every block has >= 2 statistics rounds (set by
        bootstrap(); restored by load_checkpoint)."""
        return self._bootstrapped

    @property
    def framebuffer(self) -> jnp.ndarray:
        """Current per-pixel mean image [H, W, 3] (unscrambled blocks)."""
        fb = self._state[0]
        if self.ndev > 1:
            # Drop each stripe's spare row, then flatten the stripes back
            # into the linear block-id space (contiguous ownership makes
            # this a plain reshape; XLA gathers the shards).
            fb = fb[:, : self.local_nb].reshape(
                (self.ndev * self.local_nb,) + fb.shape[2:]
            )
        fb = fb[: self.n_blocks].reshape(
            self.blocks_y, self.blocks_x, self.block_h, self.block_w, 3
        )
        fb = fb.transpose(0, 2, 1, 3, 4).reshape(
            self.blocks_y * self.block_h, self.blocks_x * self.block_w, 3
        )
        return fb[: self.height, : self.width]

    @property
    def spp_map(self) -> np.ndarray:
        """Per-pixel accumulated sample count [H, W] (diagnostics;
        forces a host read — an allgather under --multihost)."""
        from myraytracer_tpu.parallel.sharding import fetch_array

        n = fetch_array(self._state[3])
        if self.ndev > 1:
            n = n[:, : self.local_nb].reshape(-1)
        n = n[: self.n_blocks]
        m = np.repeat(
            np.repeat(
                n.reshape(self.blocks_y, self.blocks_x), self.block_h, axis=0
            ),
            self.block_w, axis=1,
        )
        return m[: self.height, : self.width]

    @property
    def segments_traced(self) -> float:
        if self._segs_pending:
            pending, self._segs_pending = self._segs_pending, []
            # Per-round segs are stripe-sharded [ndev] arrays; the fetch
            # assembles process-spanning shards (an allgather under
            # --multihost, a plain read otherwise).
            from myraytracer_tpu.parallel.sharding import fetch_array

            self._segs_total += float(
                np.asarray(
                    fetch_array(jnp.stack(pending)), dtype=np.float64
                ).sum()
            )
        return self._segs_total
