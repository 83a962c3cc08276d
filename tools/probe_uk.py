"""Subtractive step-budget probe at full-UK scale (63M citizens).

Measures whole-chunk wall time (the only trustworthy signal through this
tunnel — docs/PERF.md) for several engine variants in ONE process so the
attach stall and world build are paid once:

  classic        — default engine (replicated orders off at this scale)
  rep            — replicated orders forced on
  work-off       — work-side lax.cond forced false (removes sorts+scans)
  bus-off        — bus branch forced false
  both-off       — work and bus both forced off (movement+home+stats only)

Usage: python tools/probe_uk.py [--n 63000000] [--oas 227759] [--chunk 24]
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
    ap.add_argument("--reps", type=int, default=4, help="timed chunks")
    ap.add_argument("--variants", default="classic,rep,work-off,bus-off,both-off")
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

    params = Params.covid().as_arrays()
    seed_inf = max(1, round(args.n * 20_000 / 3_457_142))

    variants = {
        "classic": dict(),
        "rep": dict(use_replicated_orders=True),
        "work-off": dict(force_gates=(False, None)),
        "bus-off": dict(force_gates=(None, False)),
        "both-off": dict(force_gates=(False, False)),
    }

    for name in args.variants.split(","):
        opts = dict(variants[name])
        force = opts.pop("force_gates", None)
        cfg = SimConfig(
            max_steps=args.chunk * (args.reps + 2),
            chunk_size=args.chunk,
            **opts,
        )
        if force is not None:
            cfg = dataclasses.replace(cfg, debug_force_gates=force)
        state = init_state(world, seed=0, starting_infected=seed_inf)
        chunk_fn = make_chunk_runner(world, cfg)
        t0 = time.perf_counter()
        state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)
        print(f"[{name}] compile+first chunk: {time.perf_counter() - t0:.1f}s",
              flush=True)
        state, out = chunk_fn(params, state)  # transients
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
