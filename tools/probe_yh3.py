"""Fresh Y&H bench-regime subtractive budget.

Bench regime = 20k seeded -> lockdown from step 1, so the work/bus conds
are dead; the cost is fused kernel + home path + per-OA recording +
vaccination + plumbing.  Variants isolate per-OA recording and the
vaccination program.

Usage: python tools/probe_yh3.py
"""

import dataclasses
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

    base = Params.covid()
    no_vax = dataclasses.replace(
        base,
        thresholds=dataclasses.replace(base.thresholds, vaccination=-1.0),
    )
    variants = [
        ("default", base.as_arrays(), dict()),
        ("no-oa", base.as_arrays(), dict(record_exposures_per_oa=False)),
        ("no-vax", no_vax.as_arrays(), dict()),
        ("floor", no_vax.as_arrays(), dict(record_exposures_per_oa=False)),
    ]
    for name, params, opts in variants:
        cfg = SimConfig(max_steps=1500, chunk_size=250, **opts)
        st = init_state(world, seed=0, starting_infected=20_000)
        fn = make_chunk_runner(world, cfg)
        t0 = time.perf_counter()
        st, out = fn(params, st)
        jax.block_until_ready(out.seirv)
        print(f"[{name}] compile+warmup: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(4):
            st, out = fn(params, st)
        jax.block_until_ready(out.seirv)
        dt = time.perf_counter() - t0
        print(
            f"[{name}] 1000 steps: {dt:.2f}s ({dt:.3f} ms/step) "
            f"seirv={np.asarray(out.seirv)[-1].tolist()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
