"""Fused-citizen-kernel grid-size probe at 63M (lean config: no vax, no
per-OA — isolates the base step cost).

Usage: python tools/probe_fused.py
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
        63_000_000, n_output_areas=227_759, seed=0
    )
    jax.block_until_ready(world.age)
    print(f"world: {time.perf_counter() - t0:.1f}s", flush=True)

    novax = Params.covid()
    novax = Params(
        novax.disease,
        dataclasses.replace(novax.thresholds, vaccination=2.0),
    ).as_arrays()
    seed_inf = round(63_000_000 * 20_000 / 3_457_142)

    for br in (512, 1024, 2048, 4096):
        cfg = SimConfig(
            max_steps=24 * 6, chunk_size=24,
            record_exposures_per_oa=False,
            fused_block_rows=br,
        )
        state = init_state(world, seed=0, starting_infected=seed_inf)
        fn = make_chunk_runner(world, cfg)
        try:
            t0 = time.perf_counter()
            state, out = fn(novax, state)
            jax.block_until_ready(out.seirv)
            print(f"[br={br}] compile+chunk: {time.perf_counter() - t0:.1f}s",
                  flush=True)
            state, out = fn(novax, state)
            jax.block_until_ready(out.seirv)
            t0 = time.perf_counter()
            for _ in range(4):
                state, out = fn(novax, state)
            jax.block_until_ready(out.seirv)
            dt = time.perf_counter() - t0
            print(f"[br={br}] {4 * 24} steps: {dt / 96 * 1e3:.1f} ms/step; "
                  f"seirv={np.asarray(out.seirv)[-1].tolist()}", flush=True)
        except Exception as e:
            print(f"[br={br}] FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
