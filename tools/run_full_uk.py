"""Full-UK scale run: 63,000,000 citizens / 227,759 OAs on ONE TPU chip.

The reference never ran beyond the 3.46M-citizen Yorkshire & Humber region
on any hardware — "horizontal scaling using MPI" was left as a future goal
(reference README.md:24).  This runs the entire 2011-census UK population
through the full fused engine (SEIR + schedule movement + household/work/
school-room/bus exposure + interventions + vaccination) on a single chip
and records steady-state step time.

Writes sample_results/full_uk/summary.json.

Usage: python tools/run_full_uk.py [--steps 96] [--chunk 24]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CITIZENS = 63_000_000
N_OAS = 227_759


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=96, help="timed steps")
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--out", default="sample_results/full_uk")
    args = ap.parse_args()

    import jax

    from epidemicsimulator_tpu import (
        Params,
        SimConfig,
        generate_synthetic_world_device,
    )
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # pay the once-per-process tunnel attach before timing anything
    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    log(f"tunnel attach in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    # Built ON the chip (world/device_build.py): the host numpy pipeline
    # costs ~815s at this scale plus ~371s of tunnel upload.
    world = generate_synthetic_world_device(
        N_CITIZENS, n_output_areas=N_OAS, seed=0
    )
    jax.block_until_ready(world.age)
    t_build = time.perf_counter() - t0
    t_put = 0.0
    log(f"world built on-device in {t_build:.1f}s: {world.n_citizens:,} "
        f"citizens, {world.n_buildings:,} buildings, {world.n_rooms:,} "
        f"rooms, {world.n_output_areas:,} OAs")

    params = Params.covid().as_arrays()

    def measure(vax_pool: bool | None):
        cfg = SimConfig(
            max_steps=args.chunk * 2 + args.steps, chunk_size=args.chunk,
            vaccination_fixed_priority=vax_pool,
        )
        from epidemicsimulator_tpu.engine.fastpath import (
            wants_fixed_priority_vax,
        )

        # Seed proportionally to the bench workload (20k @ 3.46M) so the
        # intervention subsystems are live in the timed window.
        state = init_state(world, seed=0, starting_infected=360_000,
                           fixed_priority_vax=wants_fixed_priority_vax(
                               world, cfg))
        chunk_fn = make_chunk_runner(world, cfg)
        t0 = time.perf_counter()
        state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)
        t_compile = time.perf_counter() - t0
        log(f"[vax_pool={vax_pool}] compile+first chunk ({args.chunk} "
            f"steps) in {t_compile:.1f}s")
        state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)
        log(f"seirv after warmup: {np.asarray(out.seirv)[-1].tolist()}")
        n_chunks = args.steps // args.chunk
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)
        elapsed = time.perf_counter() - t0
        timed = n_chunks * args.chunk
        ms = elapsed / timed * 1e3
        rate = N_CITIZENS * timed / elapsed
        seirv = np.asarray(out.seirv)[-1].tolist()
        log(f"[vax_pool={vax_pool}] {timed} steps in {elapsed:.2f}s "
            f"({ms:.1f} ms/step, {rate / 1e6:.0f}M citizen-steps/s); "
            f"final seirv {seirv}")
        return ms, rate, seirv, t_compile, timed

    # SimConfig default (auto: the sampled pool-draw selector at this
    # scale — same law, K-sized work) = the headline; the fresh per-step
    # threshold selector (the reference-shaped formulation) as secondary.
    ms_per_step, rate, seirv, t_compile, timed_steps = measure(None)
    ms_fresh, rate_fresh, _, _, _ = measure(False)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(
            {
                "n_citizens": N_CITIZENS,
                "n_output_areas": N_OAS,
                "n_buildings": int(world.n_buildings),
                "device": str(jax.devices()[0]),
                "world_build_s": round(t_build, 1),
                "device_transfer_s": round(t_put, 1),
                "compile_first_chunk_s": round(t_compile, 1),
                "timed_steps": timed_steps,
                "ms_per_step": round(ms_per_step, 2),
                "citizen_steps_per_sec": round(rate),
                "ms_per_step_fresh_draw_vax": round(ms_fresh, 2),
                "citizen_steps_per_sec_fresh_draw_vax": round(rate_fresh),
                "final_seirv": seirv,
            },
            f,
            indent=1,
        )
    log(f"wrote {args.out}/summary.json")


if __name__ == "__main__":
    main()
