"""A/B the replicated-order fast path vs the classic permutation-sort path.

Same Y&H-scale synthetic world (built on device), same seeded state, 250-step
warmup then 1000 timed steps per arm.  Prints ms/step for each arm.
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
    from epidemicsimulator_tpu.engine.fastpath import wants_replicated
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    t0 = time.perf_counter()
    world = generate_synthetic_world_device(
        3_457_142, n_output_areas=15_669, seed=0
    )
    jax.block_until_ready(world.age)
    print(f"world build: {time.perf_counter() - t0:.1f}s", flush=True)

    params = Params.covid().as_arrays()

    for rep in (False, True):
        # fresh state per arm: the jitted chunk donates its state argument
        state0 = init_state(world, seed=0, starting_infected=20_000)
        cfg = SimConfig(max_steps=1250, chunk_size=250,
                        use_replicated_orders=rep)
        print(f"rep={rep}: wants_replicated="
              f"{wants_replicated(world, cfg, state0)}", flush=True)
        chunk_fn = make_chunk_runner(world, cfg)
        st = state0
        t0 = time.perf_counter()
        st, out = chunk_fn(params, st)
        jax.block_until_ready(st.status)
        print(f"  warmup chunk: {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(4):
            st, out = chunk_fn(params, st)
        jax.block_until_ready(st.status)
        dt = time.perf_counter() - t0
        print(f"  rep={rep}: 1000 steps in {dt:.2f}s "
              f"({dt:.3f} ms/step), seirv={np.asarray(out.seirv)[-1]}",
              flush=True)


if __name__ == "__main__":
    main()
