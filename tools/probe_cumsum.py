"""Cumsum kernel shootout at 63M: serial-carry vs two-phase, tile sizes.

Usage: python tools/probe_cumsum.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from epidemicsimulator_tpu.ops.pallas_scans import (
        _cumsum_pallas,
        _cumsum_pallas2,
    )

    n = 63_000_000
    t0 = time.perf_counter()
    _ = int(jnp.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)

    hit = jnp.asarray(np.random.default_rng(1).random(n) < 0.001)
    I = 20

    def bench(label, fn):
        def f(s0):
            def it(i, c):
                return c + fn(hit ^ (i + s0 > 0))[n - 1]

            return jax.lax.fori_loop(0, I, it, jnp.int32(0))

        jf = jax.jit(f)
        try:
            out = jf(jnp.int32(1))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = jf(jnp.int32(1))
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / I * 1e3
            print(f"  {label}: {dt:.2f} ms", flush=True)
        except Exception as e:
            print(f"  {label}: FAILED {str(e)[:200]}", flush=True)

    for tr in (1024, 4096, 8192):
        bench(f"serial tile_rows={tr}",
              lambda v, tr=tr: _cumsum_pallas(v, tile_rows=tr, interpret=False))
    for tr in (1024, 4096, 8192):
        bench(f"2phase tile_rows={tr}",
              lambda v, tr=tr: _cumsum_pallas2(v, tile_rows=tr, interpret=False))
    bench("jnp.cumsum", lambda v: jnp.cumsum(v.astype(jnp.int32)))


if __name__ == "__main__":
    main()
