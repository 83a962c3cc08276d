"""Populate the persistent compilation cache for the flagship configs.

After any engine change the cache key (HLO) changes and the next run of
each flagship shape pays the full cold compile (~60s at Y&H, docs/PERF.md
"Cold vs warm compile").  `make prewarm` runs one chunk of each shape and
discards the result, so interactive runs and the driver bench start warm.

Shapes prewarmed: the bench.py Y&H chunk (default SimConfig, 250-step
chunks) and the sharded 1-device runner at the same scale.
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    cache = enable_compilation_cache()
    print(f"cache dir: {cache}", flush=True)

    import jax

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)

    world = generate_synthetic_world(3_457_142, n_output_areas=15_669, seed=0)
    wd = world.device_put()
    params = Params.covid().as_arrays()
    cfg = SimConfig(max_steps=10**9, chunk_size=250)

    t0 = time.perf_counter()
    st = init_state(wd, seed=0, starting_infected=20_000)
    fn = make_chunk_runner(wd, cfg)
    st, out = fn(params, st)
    jax.block_until_ready(out.seirv)
    print(f"bench chunk (Y&H): {time.perf_counter() - t0:.1f}s", flush=True)

    # sharded 1-dev runner (the CLI --devices path)
    from epidemicsimulator_tpu.parallel.fastmesh import (
        init_sharded_state, make_fast_sharded_runner,
    )
    from epidemicsimulator_tpu.parallel.mesh import make_mesh
    from epidemicsimulator_tpu.parallel.partition import partition_world

    t0 = time.perf_counter()
    mesh = make_mesh(1)
    sw = partition_world(world, 1)
    sst = init_sharded_state(world, sw, seed=0, starting_infected=20_000)
    runner = make_fast_sharded_runner(sw, cfg, mesh)
    sst, sout = runner(sw, params, sst)
    jax.block_until_ready(sout.seirv)
    print(f"sharded 1-dev chunk: {time.perf_counter() - t0:.1f}s", flush=True)
    print("prewarm done", flush=True)


if __name__ == "__main__":
    main()
