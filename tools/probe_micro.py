"""Microbench: vaccination threshold variants + per-OA recording pieces at
63M.  Sequential dependency via fori_loop carries (docs/PERF.md: naive
timing through the tunnel reports dispatch only).

Usage: python tools/probe_micro.py [--n 63000000] [--oas 227759]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(jfn, *args, iters=20, label=""):
    import jax

    out = jfn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {label}: {dt:.2f} ms/iter", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=63_000_000)
    ap.add_argument("--oas", type=int, default=227_759)
    args = ap.parse_args()

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from epidemicsimulator_tpu.ops.hashrng import hash_bits
    from epidemicsimulator_tpu.ops.pallas_scans import (
        cumsum_pallas,
        range_totals_pallas,
    )
    from epidemicsimulator_tpu.ops.select import bisect_threshold, kth_threshold

    n, n_oa = args.n, args.oas
    t0 = time.perf_counter()
    _ = int(jnp.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)

    # static OA ranges (equal split, like an OA-major world)
    lo = np.linspace(0, n, n_oa + 1).astype(np.int32)
    oa_lo, oa_hi = jnp.asarray(lo[:-1]), jnp.asarray(lo[1:])

    elig_np = np.random.default_rng(0).random(n) < 0.95
    elig = jnp.asarray(elig_np)
    n_el = jnp.int32(int(elig_np.sum()))
    k = jnp.int32(1500)

    I = 20

    def loop(body):
        def f(seed0):
            def it(i, carry):
                return carry + body(seed0 + i.astype(jnp.uint32))

            return jax.lax.fori_loop(0, I, it, jnp.uint32(0))

        return jax.jit(f)

    # --- vaccination threshold ---
    timeit(loop(lambda s: bisect_threshold(
        hash_bits(s, jnp.arange(n, dtype=jnp.uint32)), elig, k)),
        jnp.uint32(1), iters=I, label="vax bisect(32-pass)")
    timeit(loop(lambda s: kth_threshold(
        s, elig, k, n_el, use_pallas=True)),
        jnp.uint32(1), iters=I, label="vax sampled")

    # --- per-OA recording pieces ---
    hit = jnp.asarray(np.random.default_rng(1).random(n) < 0.001)

    timeit(loop(lambda s: cumsum_pallas(hit ^ (s > 0))[n - 1].astype(jnp.uint32)),
           jnp.uint32(1), iters=I, label="cumsum_pallas(63M)")
    timeit(loop(lambda s: jnp.cumsum((hit ^ (s > 0)).astype(jnp.int32))[n - 1].astype(jnp.uint32)),
           jnp.uint32(1), iters=I, label="jnp.cumsum(63M)")

    cs = cumsum_pallas(hit)

    timeit(loop(lambda s: jnp.take(cs + s.astype(jnp.int32), oa_hi - 1).sum().astype(jnp.uint32)),
           jnp.uint32(1), iters=I, label="take 227k from 63M")
    timeit(loop(lambda s: range_totals_pallas(
        (hit ^ (s > 0)).astype(jnp.int32), oa_lo, oa_hi).sum().astype(jnp.uint32)),
        jnp.uint32(1), iters=I, label="range_totals_pallas full")


if __name__ == "__main__":
    main()
