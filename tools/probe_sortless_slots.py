"""A/B sortless_slots for the dense sortless branches at Y&H bench scale.

Peak bench hours carry ~100k work contributors — at the default 8192
slots that is ~13 sequential drain rounds per hour; wider slots halve the
round count at 4x the per-round hierarchy work.  One process, bench
regime (20k seeded, interventions live), arms over sortless_slots;
trajectories asserted bitwise-equal.

Usage: python tools/probe_sortless_slots.py [--slots 8192,16384,32768]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--citizens", type=int, default=3_457_142)
    ap.add_argument("--oas", type=int, default=15_669)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--slots", default="8192,16384,32768")
    args = ap.parse_args()
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)
    world = generate_synthetic_world(
        args.citizens, n_output_areas=args.oas, seed=0
    )
    wd = world.device_put()
    params = Params.covid().as_arrays()

    trajs = {}
    for slots in [int(s) for s in args.slots.split(",")]:
        cfg = SimConfig(max_steps=10**9, chunk_size=args.chunk,
                        sortless_slots=slots)
        st = init_state(wd, seed=0, starting_infected=20_000)
        fn = make_chunk_runner(wd, cfg)
        t0 = time.perf_counter()
        st, out = fn(params, st)
        jax.block_until_ready(out.seirv)
        print(f"[slots={slots}] compile+warmup: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        rows = []
        for _ in range(args.chunks):
            st, out = fn(params, st)
            rows.append(out.seirv)
        jax.block_until_ready(out.seirv)
        ms = (time.perf_counter() - t0) / (args.chunks * args.chunk) * 1e3
        print(f"[slots={slots}] {ms:.2f} ms/step "
              f"({args.citizens / ms * 1e3 / 1e6:.0f}M c-s/s)", flush=True)
        trajs[slots] = np.concatenate([np.asarray(r) for r in rows])
    keys = list(trajs)
    for k in keys[1:]:
        same = bool((trajs[keys[0]] == trajs[k]).all())
        print(f"bitwise {keys[0]}=={k}: {same}", flush=True)
        assert same


if __name__ == "__main__":
    main()
