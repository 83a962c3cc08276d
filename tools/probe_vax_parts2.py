"""Prove the vaccinate-cond-firing cost within single executables.

Thresholds are traced DATA, so (fired vs unfired) pairs share one
compiled program — any step-time difference is purely the runtime branch.

  A. parts=0 (trivial branch), vaccination threshold 0.005  -> fires
  B. parts=0, threshold -1 (same executable as A)           -> never fires
  C. use_replicated_orders=False (classic vaccinate), 0.005 -> fires
  D. classic, threshold -1 (same executable as C)           -> never fires

Usage: python tools/probe_vax_parts2.py
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
    p_on = base.as_arrays()
    p_off = dataclasses.replace(
        base,
        thresholds=dataclasses.replace(base.thresholds, vaccination=-1.0),
    ).as_arrays()

    cfg_trivial = SimConfig(max_steps=1500, chunk_size=250, debug_vax_parts=0)
    cfg_classic = SimConfig(max_steps=1500, chunk_size=250,
                            use_replicated_orders=False)
    variants = [
        ("A trivial-branch fired", cfg_trivial, p_on),
        ("B trivial-branch unfired", cfg_trivial, p_off),
        ("C classic fired", cfg_classic, p_on),
        ("D classic unfired", cfg_classic, p_off),
    ]
    for name, cfg, params in variants:
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
