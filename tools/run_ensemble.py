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
    t0 = time.perf_counter()
    cfg = dataclasses.replace(cfg, starting_infected=10)
    seirv = run_ensemble(world, param_list, cfg, seed=0)
    dt = time.perf_counter() - t0
    agg = args.replicates * N_CITIZENS * args.steps / dt
    print(
        f"{args.replicates} replicates x {args.steps} steps in {dt:.1f}s "
        f"({agg / 1e6:.0f}M citizen-steps/s aggregate incl. compile)",
        flush=True,
    )

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "ensemble64_seirv.npy"), seirv)
    peaks = seirv[:, :, 2].max(axis=1)
    summary = {
        "n_citizens": N_CITIZENS,
        "replicates": args.replicates,
        "steps": args.steps,
        "wall_s": round(dt, 1),
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
