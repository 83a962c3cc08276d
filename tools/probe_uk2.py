"""Second 63M budget probe: every-step (ungated) component costs.

The first probe showed the 63M bench regime sits in lockdown (work/bus
conds always false); the ~29 ms/step is all ungated work.  Variants:

  classic    — baseline
  vax-off    — vaccination threshold raised so the program never starts
               (same executable: thresholds are traced)
  oa-off     — per-OA exposure recording disabled (recompiles)
  lean       — both off

Usage: python tools/probe_uk2.py
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=63_000_000)
    ap.add_argument("--oas", type=int, default=227_759)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    args = ap.parse_args()

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
        args.n, n_output_areas=args.oas, seed=0
    )
    jax.block_until_ready(world.age)
    print(f"world build: {time.perf_counter() - t0:.1f}s", flush=True)

    base = Params.covid().as_arrays()
    novax = Params.covid()
    novax = Params(
        novax.disease,
        dataclasses.replace(novax.thresholds, vaccination=2.0),
    ).as_arrays()
    seed_inf = max(1, round(args.n * 20_000 / 3_457_142))

    variants = [
        ("classic", base, dict()),
        ("vax-off", novax, dict()),
        ("oa-off", base, dict(record_exposures_per_oa=False)),
        ("lean", novax, dict(record_exposures_per_oa=False)),
        ("oa-nocond", base, dict(oa_sparse_slots=-8192)),
        ("oa-dense", base, dict(oa_sparse_slots=0)),
        ("vax-pool", base, dict(vaccination_fixed_priority=True)),
    ]

    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]
    for name, params, opts in variants:
        cfg = SimConfig(
            max_steps=args.chunk * (args.reps + 2),
            chunk_size=args.chunk,
            **opts,
        )
        from epidemicsimulator_tpu.engine.fastpath import (
            wants_fixed_priority_vax,
        )

        state = init_state(
            world, seed=0, starting_infected=seed_inf,
            fixed_priority_vax=wants_fixed_priority_vax(world, cfg),
        )
        chunk_fn = make_chunk_runner(world, cfg)
        t0 = time.perf_counter()
        state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)
        print(f"[{name}] compile+first chunk: {time.perf_counter() - t0:.1f}s",
              flush=True)
        state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)
        dt = time.perf_counter() - t0
        steps = args.reps * args.chunk
        print(f"[{name}] {steps} steps in {dt:.2f}s "
              f"({dt / steps * 1e3:.1f} ms/step); "
              f"seirv={np.asarray(out.seirv)[-1].tolist()}", flush=True)


if __name__ == "__main__":
    main()
