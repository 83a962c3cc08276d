"""Y&H bench regime A/B: replicated-order engine vs packed-sched non-rep.

The packed-sched kernel interface (one s8 schedule lane) regressed the
Y&H bench ~0.5 ms/step under the replicated-order engine (per-step twin
copies + inflated compaction fusions appeared; docs/PERF.md).  The rep
engine's original win over non-rep was only 4.09 -> 4.06 — if packed
non-rep matches or beats it, the rep auto-gate can flip off.

Usage: python tools/probe_yh_norep.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    world = generate_synthetic_world(3_457_142, n_output_areas=15_669, seed=0)
    world = world.device_put()
    print(f"world: {time.perf_counter() - t0:.1f}s", flush=True)
    params = Params.covid().as_arrays()

    arms = [
        ("rep+auto-pack", dict()),
        ("norep+packed", dict(use_replicated_orders=False,
                              use_packed_sched=True)),
        ("norep+unpacked", dict(use_replicated_orders=False,
                                use_packed_sched=False)),
    ]
    for name, opts in arms:
        cfg = SimConfig(max_steps=1250, chunk_size=250, **opts)
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
        print(f"[{name}] 1000 steps: {dt:.2f}s ({dt:.3f} ms/step) "
              f"seirv={np.asarray(out.seirv)[-1].tolist()}", flush=True)


if __name__ == "__main__":
    main()
