"""Microbench: fused Pallas run-totals vs the XLA scan formulation, on TPU.

Method: sequential dependency forced via a fori_loop-carried value inside
one jit (block_until_ready through the axon tunnel reports dispatch time,
not execution — docs/PERF.md).  Wall clock / iterations = per-iteration
cost, including the cheap carry update (identical in both arms).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 3_457_142
ITERS = 30


def make_world_masks(rng, n, avg_coarse=40, avg_fine=9):
    starts = np.zeros(n, bool)
    ends = np.zeros(n, bool)
    fs = np.zeros(n, bool)
    fe = np.zeros(n, bool)
    i = 0
    while i < n:
        ln = max(1, int(rng.poisson(avg_coarse)))
        j = min(n, i + ln)
        starts[i] = True
        ends[j - 1] = True
        k = i
        while k < j:
            fl = max(1, int(rng.poisson(avg_fine)))
            m = min(j, k + fl)
            fs[k] = True
            fe[m - 1] = True
            k = m
        i = j
    return starts, ends, fs, fe


def timeit(fn, v0):
    out = jax.block_until_ready(fn(v0))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(v0))
    dt = time.perf_counter() - t0
    return dt / ITERS, out


def main():
    tile_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    print("building masks...", file=sys.stderr, flush=True)
    ws, we, rs, re = make_world_masks(rng, N)
    ws, we, rs, re = (jnp.asarray(x) for x in (ws, we, rs, re))
    v0 = jnp.asarray((rng.random(N) < 0.1).astype(np.int8))

    from epidemicsimulator_tpu.ops.pallas_scans import run_totals_fused
    from epidemicsimulator_tpu.ops.runsums import run_totals_from_cumsum

    @jax.jit
    def xla_arm(v):
        def body(_, v):
            vi = v.astype(jnp.int32)
            cs = jnp.cumsum(vi)
            a = run_totals_from_cumsum(cs, vi, ws, we)
            b = run_totals_from_cumsum(cs, vi, rs, re)
            return ((a + b + vi) & 1).astype(jnp.int8)

        return jax.lax.fori_loop(0, ITERS, body, v)

    @jax.jit
    def pallas_arm(v):
        def body(_, v):
            a, b = run_totals_fused(v, [(ws, we), (rs, re)], tile_rows=tile_rows)
            return ((a + b + v.astype(jnp.int32)) & 1).astype(jnp.int8)

        return jax.lax.fori_loop(0, ITERS, body, v)

    per_x, out_x = timeit(xla_arm, v0)
    print(f"XLA   : {per_x * 1e3:8.3f} ms/iter  (checksum {int(out_x.sum())})")
    per_p, out_p = timeit(pallas_arm, v0)
    print(
        f"pallas: {per_p * 1e3:8.3f} ms/iter  (checksum {int(out_p.sum())})"
        f"  tile_rows={tile_rows}  speedup {per_x / per_p:.2f}x"
    )
    assert int(out_x.sum()) == int(out_p.sum()), "MISMATCH between arms"


if __name__ == "__main__":
    main()
