"""Profile one chunk at a configurable scale and dump the xplane trace.

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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=63_000_000)
    ap.add_argument("--oas", type=int, default=227_759)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--seed-inf", type=int, default=None)
    ap.add_argument("--vax", action="store_true", help="leave vaccination live (bench regime)")
    ap.add_argument("--out", default="/tmp/uk_prof")
    args = ap.parse_args()
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
        args.n, n_output_areas=args.oas, seed=0
    )
    jax.block_until_ready(world.age)
    print(f"world build: {time.perf_counter() - t0:.1f}s", flush=True)

    novax = Params.covid()
    if args.vax:
        params = novax.as_arrays()
    else:
        params = Params(
            novax.disease,
            dataclasses.replace(novax.thresholds, vaccination=2.0),
        ).as_arrays()
    cfg = SimConfig(
        max_steps=args.chunk * 8, chunk_size=args.chunk,
        record_exposures_per_oa=False,
    )
    seed_inf = args.seed_inf
    if seed_inf is None:
        seed_inf = max(1, round(args.n * 20_000 / 3_457_142))
    state = init_state(world, seed=0, starting_infected=seed_inf)
    chunk_fn = make_chunk_runner(world, cfg)

    state, out = chunk_fn(params, state)
    jax.block_until_ready(out.seirv)
    state, out = chunk_fn(params, state)
    jax.block_until_ready(out.seirv)

    with jax.profiler.trace(args.out):
        state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)

    t0 = time.perf_counter()
    for _ in range(4):
        state, out = chunk_fn(params, state)
    jax.block_until_ready(out.seirv)
    print(f"measured: {(time.perf_counter() - t0) / (4 * args.chunk) * 1e3:.2f} ms/step",
          flush=True)
    pbs = glob.glob(args.out + "/**/*.xplane.pb", recursive=True)
    print("traces:", pbs, flush=True)


if __name__ == "__main__":
    main()
