"""In-scan subtraction of the vaccinate branch (Y&H bench regime).

probe_yh3 showed default 57.2 ms/step vs 5.0 without vaccination, yet the
standalone components microbench at ~1 ms each (probe_vax_micro).  This
probes cfg.debug_vax_parts inside the REAL chunked scan:

  7 = full (selector + apply + fan-out)        -> expect ~57
  3 = no rep fan-out
  6 = fake selector (one fixed-threshold cmp)
  5 = no apply
  0 = cond fires but branch does ~nothing

Usage: python tools/probe_vax_parts.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from epidemicsimulator_tpu import (
        Params,
        SimConfig,
        generate_synthetic_world_device,
    )
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    world = generate_synthetic_world_device(
        3_457_142, n_output_areas=15_669, seed=0
    )
    jax.block_until_ready(world.age)
    print(f"world: {time.perf_counter() - t0:.1f}s", flush=True)

    params = Params.covid().as_arrays()
    for parts in (7, 3, 6, 5, 0):
        cfg = SimConfig(max_steps=1500, chunk_size=250,
                        debug_vax_parts=parts)
        st = init_state(world, seed=0, starting_infected=20_000)
        fn = make_chunk_runner(world, cfg)
        t0 = time.perf_counter()
        st, out = fn(params, st)
        jax.block_until_ready(out.seirv)
        print(f"[parts={parts}] compile+warmup: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(4):
            st, out = fn(params, st)
        jax.block_until_ready(out.seirv)
        dt = time.perf_counter() - t0
        print(
            f"[parts={parts}] 1000 steps: {dt:.2f}s ({dt:.3f} ms/step) "
            f"seirv={np.asarray(out.seirv)[-1].tolist()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
