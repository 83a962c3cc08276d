"""Profile one lean 63M chunk and dump the xplane trace.

Companion to probe_uk_cost.py: cost_analysis counts UNTAKEN cond branches,
so the 4.28 ms/step "floor" overstates executed bytes.  This captures a
real device trace of 1 chunk (24 steps) for tools/xplane_summary.py.

Usage:
  python tools/probe_uk_profile.py            # writes /tmp/uk_prof/
  python tools/xplane_summary.py $(ls /tmp/uk_prof/**/*.xplane.pb) 40
"""

import glob
import sys
import time

sys.path.insert(0, ".")


def main():
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

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
    print(f"world build: {time.perf_counter() - t0:.1f}s", flush=True)

    novax = Params.covid()
    params = Params(
        novax.disease,
        dataclasses.replace(novax.thresholds, vaccination=2.0),
    ).as_arrays()
    cfg = SimConfig(
        max_steps=24 * 8, chunk_size=24, record_exposures_per_oa=False,
    )
    state = init_state(world, seed=0, starting_infected=364_457)
    chunk_fn = make_chunk_runner(world, cfg)

    state, out = chunk_fn(params, state)
    jax.block_until_ready(out.seirv)
    state, out = chunk_fn(params, state)
    jax.block_until_ready(out.seirv)

    with jax.profiler.trace("/tmp/uk_prof"):
        state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)

    t0 = time.perf_counter()
    for _ in range(4):
        state, out = chunk_fn(params, state)
    jax.block_until_ready(out.seirv)
    print(f"measured: {(time.perf_counter() - t0) / 96 * 1e3:.2f} ms/step",
          flush=True)
    pbs = glob.glob("/tmp/uk_prof/**/*.xplane.pb", recursive=True)
    print("traces:", pbs, flush=True)


if __name__ == "__main__":
    main()
