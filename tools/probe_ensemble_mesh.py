"""Real-chip probe for the replicate-sharded ensembles — VERDICT r4 #5.

Three arms in ONE process (tunnel variance rule), 64 replicates at the
reference's York scale:

1. packed single-device, default bus RNG (the committed configuration) —
   the no-regression baseline;
2. packed single-device, id-keyed bus RNG (`id_keyed_ensemble_rng=True`,
   the mode the sharded runner forces) — its cost must be noise;
3. `run_packed_ensemble_sharded` on a 1-device mesh — the shard_map
   formulation's overhead on the real chip, and its (R, T, 5) series
   must be BITWISE arm 2's (gid0 = 0; the multi-device equality is
   pinned on the virtual 8-dev mesh by tests/test_ensemble_mesh.py).

Writes sample_results/ensemble_sharded/summary.json.

Usage: python tools/probe_ensemble_mesh.py [--replicates 64] [--steps 500]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "sample_results/ensemble_sharded"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicates", type=int, default=64)
    ap.add_argument("--citizens", type=int, default=197_603)
    ap.add_argument("--oas", type=int, default=637)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=250)
    args = ap.parse_args()

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.engine.packed import run_packed_ensemble
    from epidemicsimulator_tpu.parallel.ensemble_mesh import (
        run_packed_ensemble_sharded,
    )

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)
    base = generate_synthetic_world(args.citizens, n_output_areas=args.oas,
                                    seed=0)

    covid = Params.covid()
    rng = np.random.default_rng(0)
    param_list = [
        Params(
            dataclasses.replace(
                covid.disease,
                exposure_chance=float(
                    covid.disease.exposure_chance * rng.uniform(0.5, 1.5)
                ),
            ),
            covid.thresholds,
        )
        for _ in range(args.replicates)
    ]
    cfg = SimConfig(max_steps=args.steps, chunk_size=args.chunk,
                    starting_infected=100)

    res = {"replicates": args.replicates, "base_citizens": args.citizens,
           "steps": args.steps}
    series = {}
    for label, idk in (("default_rng", None), ("id_keyed_rng", True)):
        c = dataclasses.replace(cfg, id_keyed_ensemble_rng=idk)
        t0 = time.perf_counter()
        s = run_packed_ensemble(base, param_list, c, seed=0)
        wall = time.perf_counter() - t0
        series[label] = np.asarray(s)
        r, t_len = s.shape[0], s.shape[1]
        agg = args.citizens * r * t_len / wall
        res[label] = {
            "wall_s": round(wall, 1),
            "steps_run": int(t_len),
            "agg_citizen_steps_per_s_M": round(agg / 1e6),
        }
        print(f"{label}: {wall:.1f}s ({agg / 1e6:.0f}M agg c-s/s)",
              flush=True)

    t0 = time.perf_counter()
    s3 = run_packed_ensemble_sharded(base, param_list, cfg, n_devices=1,
                                     seed=0)
    wall = time.perf_counter() - t0
    s3 = np.asarray(s3)
    agg = args.citizens * s3.shape[0] * s3.shape[1] / wall
    res["sharded_1dev_mesh"] = {
        "wall_s": round(wall, 1),
        "steps_run": int(s3.shape[1]),
        "agg_citizen_steps_per_s_M": round(agg / 1e6),
    }
    print(f"sharded_1dev: {wall:.1f}s ({agg / 1e6:.0f}M agg c-s/s)",
          flush=True)

    bitwise = bool(np.array_equal(series["id_keyed_rng"], s3))
    res["sharded_bitwise_matches_idkeyed_single"] = bitwise
    assert bitwise, "1-dev-mesh sharded ensemble diverged from the packing"
    # law-identity sanity between RNG modes: same aggregate attack scale
    n = series["default_rng"][0, 0].sum()
    att = [float((n - series[k][:, -1, 0]).sum())
           for k in ("default_rng", "id_keyed_rng")]
    res["attack_ratio_idkeyed_over_default"] = round(att[1] / att[0], 4)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
