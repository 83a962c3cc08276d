"""64-replicate York parameter-ensemble artifact (BASELINE.json config 5:
"Ensemble sweep: 64 vmapped disease-parameter replicates of York for
uncertainty quantification").

Sweeps exposure_chance x exposed_time around the covid defaults, runs all
replicates simultaneously in one vmapped compilation, and writes
sample_results/ensemble64_seirv.npy (R, T, 5) + ensemble64_summary.json.

Usage: python tools/run_ensemble.py [--steps 2000] [--replicates 64]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

N_CITIZENS = 208_000  # York 2011 census scale (see docs/FIDELITY.md)
N_OAS = 649


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--replicates", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--out", default="sample_results")
    ap.add_argument("--early-exit", choices=["sei", "ei"], default="sei",
                    help="stop condition across replicas: 'sei' = faithful "
                    "S+E+I>0 (statistics.rs:289-291, runs the vaccination "
                    "tail), 'ei' = benchmarking shortcut E+I>0")
    ap.add_argument("--engine", choices=["vmap", "packed"], default="packed",
                    help="packed: R replicas as one world (engine/packed.py)"
                         " — ~3x the vmapped formulation's throughput")
    args = ap.parse_args()

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.engine.ensemble import run_ensemble

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    world = generate_synthetic_world(N_CITIZENS, n_output_areas=N_OAS, seed=0)
    world = world.device_put()
    print(f"world: {time.perf_counter() - t0:.1f}s", flush=True)

    base = Params.covid()
    rng = np.random.default_rng(0)
    param_list = []
    for r in range(args.replicates):
        param_list.append(
            Params(
                dataclasses.replace(
                    base.disease,
                    exposure_chance=float(
                        base.disease.exposure_chance * rng.uniform(0.5, 1.5)
                    ),
                    exposed_time=int(rng.integers(24, 120)),
                    infected_time=int(rng.integers(96, 336)),
                ),
                base.thresholds,
            )
        )

    cfg = SimConfig(max_steps=args.steps, chunk_size=args.chunk)
    cfg = dataclasses.replace(cfg, starting_infected=10)

    # separate compile from steady state: run one warmup chunk explicitly
    if args.engine == "packed":
        from epidemicsimulator_tpu.engine.packed import (
            init_packed_state, make_packed_runner, pack_replicas,
            run_packed_ensemble,
        )

        # pack against the HOST world (pack_replicas tiles core lanes)
        base = generate_synthetic_world(N_CITIZENS, n_output_areas=N_OAS,
                                        seed=0)
        t0 = time.perf_counter()
        pe = pack_replicas(base, param_list)
        print(f"pack: {time.perf_counter() - t0:.1f}s "
              f"({pe.world.n_citizens:,} packed citizens)", flush=True)
        th = param_list[0].as_arrays().thresholds
        st0 = init_packed_state(pe, seed=0, starting_infected=10)
        runner = make_packed_runner(pe, cfg)
        t0 = time.perf_counter()
        _st, _o = runner(th, st0)  # donates st0
        jax.block_until_ready(_o)
        compile_s = time.perf_counter() - t0
        print(f"compile+first chunk ({args.chunk} steps): {compile_s:.1f}s",
              flush=True)
        # timed run: same compiled runner + device-resident packed world —
        # the run_packed_ensemble convenience wrapper would re-pack and
        # re-upload 13M citizens through the tunnel inside the timed region
        st = init_packed_state(pe, seed=0, starting_infected=10)
        t0 = time.perf_counter()
        # Per-chunk sync loop.  An async-dispatch variant (outputs left on
        # device, early-exit flag read one chunk behind the frontier) HUNG
        # through the axon tunnel — unbounded dispatch pipelining over
        # donated buffers stalls this runtime; the per-chunk materialise
        # costs ~0.3 ms/step of D2H against a 12 ms step and keeps the
        # early-exit check exact.
        from epidemicsimulator_tpu.engine.packed import ensemble_done

        chunks, steps = [], 0
        while steps < args.steps:
            st, out = runner(th, st)
            out = np.asarray(out)  # (chunk, R, 5)
            chunks.append(out)
            steps += args.chunk
            # one semantics with the library (engine.packed.ensemble_done):
            # faithful S+E+I by default, E+I only with --early-exit ei
            if ensemble_done(out[-1], args.early_exit):
                break
        dt = time.perf_counter() - t0
        steps_run = len(chunks) * args.chunk
        seirv = np.transpose(
            np.concatenate(chunks, axis=0)[: args.steps], (1, 0, 2)
        )
    else:
        from epidemicsimulator_tpu.engine.ensemble import (
            init_ensemble_state, make_ensemble_runner, stack_params,
        )

        stacked = stack_params(param_list)
        state0 = init_ensemble_state(
            world, args.replicates, seed=0, starting_infected=10
        )
        runner = make_ensemble_runner(world, cfg)
        t0 = time.perf_counter()
        _st, _ = runner(stacked, state0)
        jax.block_until_ready(_)
        compile_s = time.perf_counter() - t0
        print(f"compile+first chunk ({args.chunk} steps): {compile_s:.1f}s",
              flush=True)
        # second full run hits the cached compiled runner: pure execution
        t0 = time.perf_counter()
        seirv = run_ensemble(world, param_list, cfg, seed=0, engine="vmap")
        dt = time.perf_counter() - t0
        steps_run = args.steps
    agg = args.replicates * N_CITIZENS * steps_run / dt
    print(
        f"{args.replicates} replicates x {steps_run} steps in {dt:.1f}s "
        f"compiled ({agg / 1e6:.0f}M c-s/s aggregate, "
        f"{dt * 1e3 / steps_run:.2f} ms/ensemble-step)",
        flush=True,
    )

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "ensemble64_seirv.npy"), seirv)
    peaks = seirv[:, :, 2].max(axis=1)
    summary = {
        "engine": args.engine,
        "early_exit": args.early_exit if args.engine == "packed" else "none",
        "n_citizens": N_CITIZENS,
        "replicates": args.replicates,
        "steps": steps_run,
        "wall_s": round(dt, 1),
        "compile_first_chunk_s": round(compile_s, 1),
        "ms_per_ensemble_step": round(dt * 1e3 / steps_run, 2),
        "aggregate_citizen_steps_per_sec": round(agg),
        "peak_infected_min": int(peaks.min()),
        "peak_infected_median": int(np.median(peaks)),
        "peak_infected_max": int(peaks.max()),
    }
    with open(os.path.join(args.out, "ensemble64_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
