"""TPU microbench: Benes static-permutation replay vs the packed u32
permutation sort, at Y&H scale (and optionally others).

Usage: python tools/probe_benes.py [--n 3457142] [--iters 100]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3_457_142)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from epidemicsimulator_tpu.ops.benes import benes_permute, route_permutation
    from epidemicsimulator_tpu.ops.runsums import permute_by_sort

    n = args.n
    rng = np.random.default_rng(0)
    rank = rng.permutation(n).astype(np.int32)
    t0 = time.perf_counter()
    ctrl, k = route_permutation(np.argsort(rank).astype(np.int32))
    print(f"route: {time.perf_counter() - t0:.1f}s (k={k}, "
          f"ctrl {sum(c.nbytes for c in ctrl) / 1e6:.0f} MB)", flush=True)

    rank_d = jax.device_put(jnp.asarray(rank))
    ctrl_d = [jax.device_put(jnp.asarray(g)) for g in ctrl]
    x0 = jax.device_put(jnp.asarray(
        rng.integers(0, 32, n).astype(np.int8)))

    # equality: permute_by_sort(rank, x) == forward replay of argsort(rank)
    a = permute_by_sort(rank_d, x0, bits=5)
    b = benes_permute(x0, ctrl_d, k)
    a, b = np.asarray(a), np.asarray(b)
    print("equal:", np.array_equal(a, b), flush=True)

    @jax.jit
    def loop_sort(x):
        def body(i, x):
            return permute_by_sort(rank_d, x, bits=5)
        return jax.lax.fori_loop(0, args.iters, body, x)

    @jax.jit
    def loop_benes(x):
        def body(i, x):
            return benes_permute(x, ctrl_d, k, interpret=False)
        return jax.lax.fori_loop(0, args.iters, body, x)

    for name, fn in (("sort", loop_sort), ("benes", loop_benes)):
        y = fn(x0)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        y = fn(x0)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        print(f"[{name}] {args.iters} passes: {dt:.3f}s "
              f"({dt / args.iters * 1e3:.3f} ms/pass)", flush=True)


if __name__ == "__main__":
    main()
