"""Microbench the vaccinate-branch components at Y&H scale (3.46M).

The Y&H bench regime measures ~57 ms/step with vaccination live vs 5.0
without (tools/probe_yh3.py) — this isolates which piece of the vaccinate
cond costs ~52 ms.

Usage: python tools/probe_vax_micro.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(name, fn, *args, iters=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)
    return dt


def main():
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from epidemicsimulator_tpu.ops.hashrng import hash_bits
    from epidemicsimulator_tpu.ops.select import (
        bisect_threshold,
        kth_threshold,
        radix_threshold,
    )
    from epidemicsimulator_tpu.ops.sparse import compact_positions, scatter_bits

    t0 = time.perf_counter()
    _ = int(jnp.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)

    n = 3_457_142
    k = 1530
    KS = 2048
    rng = np.random.default_rng(0)
    eligible = jnp.asarray(rng.random(n) < 0.55)
    chosen_np = np.zeros(n, bool)
    chosen_np[rng.choice(n, k, replace=False)] = True
    chosen = jnp.asarray(chosen_np)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    seed = jnp.uint32(12345)
    n_elig = jnp.sum(eligible.astype(jnp.int32))

    idx = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def f_hash(s):
        return hash_bits(s, idx)

    @jax.jit
    def f_bisect(s):
        return bisect_threshold(hash_bits(s, idx), eligible, k)

    @jax.jit
    def f_radix(s):
        return radix_threshold(hash_bits(s, idx), eligible, k)

    @jax.jit
    def f_kth(s):
        return kth_threshold(s, eligible, k, n_elig, use_pallas=True)

    @jax.jit
    def f_compact(m):
        return compact_positions(m, KS)

    @jax.jit
    def f_fanout(m):
        pos, live, cnt = compact_positions(m, KS)
        safe = jnp.minimum(pos, n - 1)
        a = scatter_bits(n, jnp.take(perm, safe), live)
        b = scatter_bits(n, jnp.take(perm, safe), live)
        return a, b, cnt

    @jax.jit
    def f_below(s):
        scores = hash_bits(s, idx)
        tau = bisect_threshold(scores, eligible, k)
        below = eligible & (scores < tau)
        at = eligible & (scores == tau)
        return below, at

    timeit("hash pass", f_hash, seed)
    timeit("bisect32 (fused hash)", f_bisect, seed)
    timeit("radix16x8 (fused hash)", f_radix, seed)
    timeit("kth_threshold (engine entry)", f_kth, seed)
    timeit("compact_positions K=2048", f_compact, chosen)
    timeit("fan-out (compact+2 scatter)", f_fanout, chosen)
    timeit("below/at lanes (bisect+2 cmp)", f_below, seed)

    got_b = int(f_bisect(seed))
    got_r = int(f_radix(seed))
    print(f"bisect={got_b:#x} radix={got_r:#x} equal={got_b == got_r}",
          flush=True)


if __name__ == "__main__":
    main()
