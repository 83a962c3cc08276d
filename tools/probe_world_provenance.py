"""Does the vax-active stall follow the WORLD BUFFERS or the executable?

bench.py (host-built world) runs the vax-active regime at 3.91 ms/step;
every device-built-world probe runs it at ~57-62 ms/step.  Shapes can
differ between the two builders (data-dependent building/room counts), so
this holds shape AND values fixed: build the world on device, then round
trip it through host numpy + device_put.  Both arms share one memoised
chunk-runner executable (same world signature), so any timing difference
is purely the provenance/layout of the world buffers.

  A. round-tripped world (host numpy -> device_put)
  B. device-native world (jit outputs, as all probes use)

Usage: python tools/probe_world_provenance.py
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
    world_dev = generate_synthetic_world_device(
        3_457_142, n_output_areas=15_669, seed=0
    )
    jax.block_until_ready(world_dev.age)
    print(f"world: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    world_host = jax.tree.map(np.asarray, world_dev)
    print(f"D2H roundtrip: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    world_rt = world_host.device_put()
    jax.block_until_ready(world_rt.age)
    print(f"H2D: {time.perf_counter() - t0:.1f}s", flush=True)

    params = Params.covid().as_arrays()
    cfg = SimConfig(max_steps=1500, chunk_size=250)
    for name, world in (("A roundtrip", world_rt), ("B device-native", world_dev)):
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
