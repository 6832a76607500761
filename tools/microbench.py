"""Kernel-cost microbenchmarks (run on the TPU).

Measures the primitive costs that make up one megakernel bounce iteration,
to attribute the measured ~4x gap between the trace kernel's wall time and
its pure-ALU bound (BENCH.md "north star" section):

  1. vector-op throughput inside a while loop ([16,128] f32 fma chain)
  2. while-loop iteration overhead incl. the any() cond reduction
  3. SMEM scalar read + broadcast cost
  4. lax.cond gate cost (any() + branch)

Usage: python tools/microbench.py   (prints one line per probe)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (16, 128)


def _timed_call(body_fn, iters, scalars):
    """One pallas call running `iters` while-loop iterations; returns secs.

    The axon tunnel costs ~80 ms per dispatch+readback, so callers must
    difference two iteration counts to isolate the per-iteration cost.
    """

    def kernel(*refs):
        s_ref = refs[0] if scalars is not None else None
        o_ref = refs[-1]
        x0 = jax.lax.broadcasted_iota(jnp.int32, SHAPE, 1).astype(jnp.float32)

        def cond(c):
            return c[0] < iters

        def body(c):
            i, x = c
            return i + 1, body_fn(i, x, s_ref)

        _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x0))
        o_ref[...] = x

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if scalars is not None else 0,
        grid=(1,),
        in_specs=[],
        out_specs=[pl.BlockSpec(SHAPE, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)],
    )
    args = (scalars,) if scalars is not None else ()
    f = lambda: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(SHAPE, jnp.float32)],
    )(*args)
    np.asarray(f()[0])  # compile + warm
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(f()[0])
    return (time.perf_counter() - t0) / reps


def run_kernel(name, body_fn, n_ops_per_iter, scalars=None, base=100_000):
    t_lo = _timed_call(body_fn, base, scalars)
    t_hi = _timed_call(body_fn, base * 2, scalars)
    per_iter_ns = (t_hi - t_lo) / base * 1e9
    msg = f"{name}: {per_iter_ns:.1f} ns/iter (fixed {t_lo*1e3:.1f} ms)"
    if n_ops_per_iter:
        msg += f", {per_iter_ns / n_ops_per_iter:.2f} ns/op"
    print(msg, flush=True)


def main():
    sc = jnp.arange(64, dtype=jnp.float32).reshape(4, 16)

    # 1: pure fma chain, 64 dependent vector ops per iteration
    def fma64(i, x, _s):
        for _ in range(32):
            x = x * 1.000001 + 0.5
            x = x - 0.5
        return x

    run_kernel("fma-chain-64op", fma64, 64, base=3_000_000)

    # 2: empty body → pure loop + cond overhead
    run_kernel("empty-loop", lambda i, x, _s: x, 0, base=20_000_000)

    # 3: 16 SMEM scalar reads + broadcast-add per iteration
    def smem16(i, x, s_ref):
        k = i % 16
        for r in range(4):
            for c in range(4):
                x = x + s_ref[r, c]
        return x * 0.999

    run_kernel("smem-16reads", smem16, 16, scalars=sc, base=5_000_000)

    # 4: any() reduce + cond gate per iteration
    def gate(i, x, _s):
        def yes():
            return x * 1.000001

        return jax.lax.cond(jnp.any(x > -1.0), yes, lambda: x)

    run_kernel("any+cond-gate", gate, 1, base=2_000_000)

    # 5: a realistic 16-sphere hit sweep (the megakernel inner loop shape):
    # ~25 vector ops + 4 SMEM scalar reads per sphere.
    sph = jnp.arange(4 * 16, dtype=jnp.float32).reshape(4, 16) * 0.01 + 1.0

    def hit16(i, x, s_ref):
        o = x * 0.001
        d = x * 0.0005 + 0.5
        t_best = x * 0.0 + 1e4
        for k in range(16):
            cx = s_ref[0, k]
            cy = s_ref[1, k]
            cz = s_ref[2, k]
            rsq = s_ref[3, k]
            ocx = o - cx
            ocy = o - cy
            ocz = o - cz
            b = ocx * d + ocy * d + ocz * d
            c = ocx * ocx + ocy * ocy + ocz * ocz - rsq
            disc = b * b - c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = -b - sq
            t2 = -b + sq
            ok = (t1 >= 1e-3) & (t1 < 1e4)
            tc = jnp.where(ok, t1, t2)
            valid = (disc >= 0.0) & (tc >= 1e-3) & (tc < 1e4)
            tc = jnp.where(valid, tc, 1e4)
            t_best = jnp.minimum(t_best, tc)
        return t_best * 1e-4 + x * 0.9

    run_kernel("hit-sweep-16sph", hit16, 16 * 25, scalars=sph, base=500_000)

    # 6: carried-state cost — 25 live arrays through the while loop (the
    # megakernel's carry size). Measured ≲ 0.3 us/iter: the 8-vs-41 us
    # iteration gap is NOT carry spills.
    def carry25(i, x, _s):
        return x * 1.000001 + 0.000001

    run_kernel("carry-1-baseline", carry25, 1, base=2_000_000)

    # 7: the MERGED-fetch sweep shape — per sphere 14 SMEM scalar reads,
    # the hit quadratic, and 11 record selects on `better`. Distinguishes
    # "SMEM read port limit" from "ALU throughput" for the in-situ sweep.
    rec = jnp.arange(14 * 16, dtype=jnp.float32).reshape(14, 16) * 0.01 + 1.0

    def hit16_merged(i, x, s_ref):
        o = x * 0.001
        d = x * 0.0005 + 0.5
        t_best = x * 0.0 + 1e4
        acc = [x * 0.0] * 11
        for k in range(16):
            cx = s_ref[0, k]
            cy = s_ref[1, k]
            cz = s_ref[2, k]
            rsq = s_ref[3, k]
            ocx = o - cx
            ocy = o - cy
            ocz = o - cz
            b = ocx * d + ocy * d + ocz * d
            c = ocx * ocx + ocy * ocy + ocz * ocz - rsq
            disc = b * b - c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = -b - sq
            t2 = -b + sq
            ok = (t1 >= 1e-3) & (t1 < 1e4)
            tc = jnp.where(ok, t1, t2)
            valid = (disc >= 0.0) & (tc >= 1e-3) & (tc < 1e4)
            tc = jnp.where(valid, tc, 1e4)
            better = tc < t_best
            t_best = jnp.where(better, tc, t_best)
            acc = [
                jnp.where(better, s_ref[3 + j, k], a)
                for j, a in enumerate(acc)
            ]
        out = t_best * 1e-4 + x * 0.9
        for a in acc:
            out = out + a * 1e-7
        return out

    run_kernel(
        "hit-sweep-16sph-merged", hit16_merged, 16 * 36, scalars=rec,
        base=300_000,
    )

    # 8: SMEM read throughput — 32 reads + 1 add each per iteration.
    def smem32(i, x, s_ref):
        for r in range(8):
            for c in range(4):
                x = x + s_ref[r, c]
        return x * 0.999

    run_kernel(
        "smem-32reads", smem32, 32,
        scalars=jnp.arange(128, dtype=jnp.float32).reshape(8, 16),
        base=2_000_000,
    )


if __name__ == "__main__":
    main()
