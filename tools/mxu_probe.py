"""Closest-hit formulation probe: SMEM-scalar sweep vs matrix forms (TPU).

VERDICT r1 item 2: measure — not argue — whether an MXU/matrix
formulation of chunk closest-hit beats the production SMEM-scalar sweep.
Three kernels compute the same work shape (R=2048 rays × S=128 spheres
per iteration, many iterations to amortize dispatch):

  sweep   the production merged sweep's shape: per sphere, SMEM scalar
          reads + quadratic + record selects on the carry, SWEEP_WIDTH=4
          tree combine (kernels/trace.py run_hit).
  mxu     b/c quadratic terms via one [R,16]x[16,2S] dot_general on the
          MXU (rays as rows), then VPU disc/roots/window on the [R,S]
          matrix, min+argmin over S (winner index for a later gated
          record fetch — shader.wgsl:314-329 contract).
  vbcast  same matrix layout but the quadratic from VPU row-broadcasts
          (sphere constants as [1,S] rows against [R,1] ray columns) —
          no MXU: isolates "matrix restructuring" from "MXU flops".

Matrix forms have no serial carry chain and no SMEM scalar broadcasts —
the two suspects for the measured ~7x in-situ-vs-ALU-floor gap of the
sweep (BENCH.md). Winner-record handling differs: sweep carries the
record; matrix forms materialize the winner *index* (min-index over S,
earliest-wins like the sequential sweep) and would re-fetch the record
via the existing gated fetch path.

Usage: python tools/mxu_probe.py     (TPU; 3 Mosaic compiles)
Env:   PROBE_ITERS (2000), PROBE_SPHERES (128)
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_ROWS = 16  # rays tile: [16, 128] = 2048 rays
LANES = 128
R = R_ROWS * LANES
T_MIN = 1e-3  # plain floats: jnp scalars at module scope would be
T_MAX = 1e4   # captured tracer constants inside pallas kernels


def _build(kernel, args, out_shape, num_prefetch):
    """Build a callable pallas invocation; first ``num_prefetch`` args
    ride SMEM, the rest VMEM."""
    return lambda: pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=num_prefetch,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim,
                             memory_space=pltpu.VMEM)
                for a in args[num_prefetch:]
            ],
            out_specs=[pl.BlockSpec(
                out_shape, lambda *_: (0, 0), memory_space=pltpu.VMEM
            )],
        ),
        out_shape=[jax.ShapeDtypeStruct(out_shape, jnp.float32)],
    )(*args)


def time_pair(make_kernel, iters, args, out_shape, pairs_per_iter,
              num_prefetch):
    """Difference two iteration counts to cancel dispatch+fixed cost.
    Lo/hi calls are timed INTERLEAVED (min of 5 rounds each) so the
    TPU's multi-minute performance phases cannot flip the sign."""
    f_lo = _build(make_kernel(iters), args, out_shape, num_prefetch)
    f_hi = _build(make_kernel(iters * 2), args, out_shape, num_prefetch)
    np.asarray(f_lo()[0])  # compile + warm
    np.asarray(f_hi()[0])
    t_lo = []
    t_hi = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f_lo()[0])
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f_hi()[0])
        t_hi.append(time.perf_counter() - t0)
    per_iter = (min(t_hi) - min(t_lo)) / iters
    return per_iter / pairs_per_iter * 1e12, min(t_lo)  # ps/pair, lo secs


def main() -> int:
    iters = int(os.environ.get("PROBE_ITERS", "2000"))
    S = int(os.environ.get("PROBE_SPHERES", "128"))

    rng = np.random.RandomState(0)
    centers = rng.uniform(-8, 8, (3, S)).astype(np.float32)
    radii = rng.uniform(0.2, 1.0, S).astype(np.float32)

    # --- A: production-shaped SMEM scalar sweep (merged, w4 tree) --------
    sph = jnp.asarray(np.concatenate([
        centers, radii[None], rng.rand(9, S).astype(np.float32)
    ]))  # [13, S] — 4 quadratic rows + 9 record rows (the 9-row table)

    def make_sweep(n_iters):
        def kernel(s_ref, o_ref):
            x0 = jax.lax.broadcasted_iota(
                jnp.int32, (R_ROWS, LANES), 1).astype(jnp.float32)

            def cand(si, o, d):
                cx = s_ref[0, si]
                cy = s_ref[1, si]
                cz = s_ref[2, si]
                r_ = s_ref[3, si]
                ocx = o - cx
                ocy = o * 0.5 - cy
                ocz = o * 0.25 - cz
                b = ocx * d + ocy * d + ocz * d
                c = ocx * ocx + ocy * ocy + ocz * ocz - r_ * r_
                disc = b * b - c
                sq = jnp.sqrt(disc)
                t1 = -b - sq
                t2 = -b + sq
                tc = jnp.where(t1 >= T_MIN, t1, t2)
                tc = jnp.where(tc >= T_MIN, tc, T_MAX)
                return tc, tuple(s_ref[4 + j, si] + (o * 0.0)
                                 for j in range(9))

            def body(c_):
                i, x = c_
                o = x * 0.001 + i.astype(jnp.float32) * 1e-9
                d = x * 0.0005 + 0.5
                t_best = x * 0.0 + T_MAX
                acc = [x * 0.0] * 9
                si = 0
                while si < S:
                    cands = [cand(si + j, o, d) for j in range(4)]
                    while len(cands) > 1:
                        nxt = []
                        for k in range(0, len(cands) - 1, 2):
                            (ta, va), (tb, vb) = cands[k], cands[k + 1]
                            pick = tb < ta
                            nxt.append((
                                jnp.where(pick, tb, ta),
                                tuple(jnp.where(pick, y, z)
                                      for z, y in zip(va, vb)),
                            ))
                        cands = nxt
                    tg, vg = cands[0]
                    better = tg < t_best
                    t_best = jnp.where(better, tg, t_best)
                    acc = [jnp.where(better, v, a)
                           for v, a in zip(vg, acc)]
                    si += 4
                out = t_best * 1e-4 + x * 0.9
                for a in acc:
                    out = out + a * 1e-7
                return i + 1, out

            _, x = jax.lax.while_loop(
                lambda c_: c_[0] < n_iters, body, (jnp.int32(0), x0))
            o_ref[...] = x

        return kernel

    # --- B: MXU dot form -------------------------------------------------
    # Features per ray (K=16, padded): [dx dy dz ox oy oz od o2 1 0...].
    # Panel [16, 2S]: b-cols then c-cols.
    K = 16
    panel = np.zeros((K, 2 * S), np.float32)
    panel[0:3, :S] = -centers          # b: -c·d
    panel[6, :S] = 1.0                 # b: + o·d
    panel[3:6, S:] = -2.0 * centers    # c: -2 o·c
    panel[7, S:] = 1.0                 # c: + |o|^2
    panel[8, S:] = (centers ** 2).sum(0) - radii ** 2  # c: + |c|^2 - r^2
    panel_j = jnp.asarray(panel)

    a0 = rng.uniform(-1, 1, (R, K)).astype(np.float32)
    a0_j = jnp.asarray(a0)

    def make_mxu(n_iters):
        def kernel(a_ref, p_ref, o_ref):
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)

            def body(c_):
                i, acc = c_
                a = a_ref[...] + i.astype(jnp.float32) * 1e-9
                t = jax.lax.dot_general(
                    a, p_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                b = t[:, :S]
                cterm = t[:, S:]
                disc = b * b - cterm
                sq = jnp.sqrt(disc)
                t1 = -b - sq
                t2 = -b + sq
                tc = jnp.where(t1 >= T_MIN, t1, t2)
                tc = jnp.where(tc >= T_MIN, tc, T_MAX)
                tb = jnp.min(tc, axis=1, keepdims=True)
                win = tc <= tb
                idx = jnp.min(
                    jnp.where(win, lane_iota, jnp.int32(1 << 20)),
                    axis=1, keepdims=True,
                ).astype(jnp.float32)
                return i + 1, acc + tb + idx * 1e-6

            acc0 = jnp.zeros((R, 1), jnp.float32)
            _, acc = jax.lax.while_loop(
                lambda c_: c_[0] < n_iters, body, (jnp.int32(0), acc0))
            o_ref[...] = jnp.broadcast_to(acc, (R, LANES))[:, :LANES] * 1e-6

        return kernel

    # --- C: VPU row-broadcast matrix form --------------------------------
    # Sphere constants as [1,S] rows vs per-ray [R,1] columns: the same
    # quadratic as the sweep but with no SMEM scalars and no carry chain.
    rows = np.concatenate([
        centers, (radii ** 2)[None]
    ])  # [4, S]
    rows_j = jnp.asarray(np.ascontiguousarray(rows))
    colsrc = jnp.asarray(rng.uniform(-1, 1, (R, 1)).astype(np.float32))

    def make_vbcast(n_iters):
        def kernel(r_ref, c_ref, o_ref):
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
            cx = r_ref[...][0:1, :]    # [1, S]
            cy = r_ref[...][1:2, :]
            cz = r_ref[...][2:3, :]
            rsq = r_ref[...][3:4, :]

            def body(c_):
                i, acc = c_
                base = c_ref[...] + i.astype(jnp.float32) * 1e-9  # [R,1]
                ox, oy, oz = base, base * 0.5, base * 0.25
                dx, dy, dz = base * 0.1 + 0.3, base * 0.2 + 0.1, base * 0.3 - 0.9
                ocx = ox - cx              # [R, S]
                ocy = oy - cy
                ocz = oz - cz
                b = ocx * dx + ocy * dy + ocz * dz
                c2 = ocx * ocx + ocy * ocy + ocz * ocz - rsq
                disc = b * b - c2
                sq = jnp.sqrt(disc)
                t1 = -b - sq
                t2 = -b + sq
                tc = jnp.where(t1 >= T_MIN, t1, t2)
                tc = jnp.where(tc >= T_MIN, tc, T_MAX)
                tb = jnp.min(tc, axis=1, keepdims=True)
                win = tc <= tb
                idx = jnp.min(
                    jnp.where(win, lane_iota, jnp.int32(1 << 20)),
                    axis=1, keepdims=True,
                ).astype(jnp.float32)
                return i + 1, acc + tb + idx * 1e-6

            acc0 = jnp.zeros((R, 1), jnp.float32)
            _, acc = jax.lax.while_loop(
                lambda c_: c_[0] < n_iters, body, (jnp.int32(0), acc0))
            o_ref[...] = jnp.broadcast_to(acc, (R, LANES)) * 1e-6

        return kernel

    pairs = R * S
    print(f"R={R} rays x S={S} spheres = {pairs} pairs/iter, "
          f"base iters {iters}", flush=True)

    def report(name, ps, lo, it):
        print(f"{name}: {ps:8.2f} ps/pair → {1e3 / ps:7.1f} Gpairs/s "
              f"(lo run {lo * 1e3:.0f} ms @ {it} iters)", flush=True)

    # The sweep runs far fewer pairs/s than the matrix forms; scale its
    # iteration count down so lo/hi runs stay seconds, not minutes.
    it_s = max(1000, iters // 8)
    ps, lo = time_pair(make_sweep, it_s, (sph,), (R_ROWS, LANES), pairs, 1)
    report("sweep  (SMEM scalars, w4, merged record)", ps, lo, it_s)

    ps_m, lo = time_pair(
        make_mxu, iters, (a0_j, panel_j), (R, LANES), pairs, 0)
    report("mxu    (dot [R,16]x[16,2S] + VPU post)  ", ps_m, lo, iters)

    ps_v, lo = time_pair(
        make_vbcast, iters, (rows_j, colsrc), (R, LANES), pairs, 0)
    report("vbcast (VPU row-broadcast matrix)       ", ps_v, lo, iters)
    return 0


if __name__ == "__main__":
    sys.exit(main())
