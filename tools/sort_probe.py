"""Cost of a per-bounce ray sort on TPU: argsort + state gather.

The wavefront-sorted redesign (BENCH.md "Remaining head-room") would pay,
per bounce round, one key sort + a gather of the full ray state. This
probe measures that cost at the headline-scene ray count so the design
can be accepted/rejected on numbers, like tools/mxu_probe.py did for the
MXU hit formulation.

Method: jit a step that (a) derives a pseudo-random u32 key from the
state (so iterations can chain without host traffic), (b) argsorts the
keys, (c) gathers NPAYLOAD f32 arrays by the permutation. Chain ITERS
steps, force one scalar, and difference against a no-sort chain of the
same shape to isolate sort+gather. axon block_until_ready does not
block; forcing is a host read of a tiny slice.

Env: SORT_N (960000), SORT_PAYLOAD (15), SORT_ITERS (30).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    n = int(os.environ.get("SORT_N", "960000"))
    npay = int(os.environ.get("SORT_PAYLOAD", "15"))
    iters = int(os.environ.get("SORT_ITERS", "30"))

    state = [
        jnp.arange(n, dtype=jnp.float32) * (0.37 + 0.11 * i)
        for i in range(npay)
    ]

    def keys_of(state):
        # Cheap u32 mix of one payload row — stands in for the Morton/
        # octant key computation (itself a handful of vector ops).
        k = jax.lax.bitcast_convert_type(state[0], jnp.uint32)
        k = k * jnp.uint32(2654435761) ^ (k >> jnp.uint32(13))
        return k

    @jax.jit
    def step_sorted(state):
        k = keys_of(state)
        perm = jnp.argsort(k)
        return [s[perm] for s in state]

    @jax.jit
    def step_base(state):
        k = keys_of(state)
        # Same key math, a permutation-free update of matching output
        # shapes (the adds keep XLA from collapsing the chain).
        kf = k.astype(jnp.float32) * jnp.float32(1e-30)
        return [s + kf for s in state]

    def run(step, state):
        out = [jnp.array(np.asarray(s)) for s in state]
        out = step(out)  # compile + warm
        np.asarray(out[0][:4])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(out)
        np.asarray(out[0][:4])  # force the chain
        t1 = time.perf_counter()
        return (t1 - t0) / iters * 1e3

    # Interleave rounds to ride out TPU performance phases.
    ms_sorted, ms_base = [], []
    for _ in range(3):
        ms_sorted.append(run(step_sorted, state))
        ms_base.append(run(step_base, state))
    s_med = sorted(ms_sorted)[1]
    b_med = sorted(ms_base)[1]
    print(f"n={n} payload={npay} iters={iters}")
    print(f"sorted chain : {ms_sorted} -> median {s_med:.2f} ms/iter")
    print(f"baseline     : {ms_base} -> median {b_med:.2f} ms/iter")
    print(f"sort+gather  : {s_med - b_med:.2f} ms per round")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
