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

    # steady-state ms/ensemble-step per arm: pack ONCE, device-resident
    # world, one warm chunk outside the timed window (the run_ensemble
    # tool's protocol — the convenience wrapper re-packs and re-uploads
    # 13M citizens inside the wall clock and is not a timing surface)
    from epidemicsimulator_tpu.engine.packed import (
        init_packed_state, make_packed_runner, pack_replicas,
    )

    t0 = time.perf_counter()
    pe = pack_replicas(base, param_list)
    res["pack_s"] = round(time.perf_counter() - t0, 1)
    th0 = param_list[0].as_arrays().thresholds
    n_chunks = max(1, args.steps // args.chunk)

    series = {}
    for label, idk in (("default_rng", None), ("id_keyed_rng", True)):
        c = dataclasses.replace(cfg, id_keyed_ensemble_rng=idk)
        runner = make_packed_runner(pe, c)
        st = init_packed_state(pe, seed=0,
                               starting_infected=cfg.starting_infected)
        t0 = time.perf_counter()
        st, out = runner(th0, st)
        np.asarray(out)
        compile_s = time.perf_counter() - t0
        st = init_packed_state(pe, seed=0,
                               starting_infected=cfg.starting_infected)
        chunks = []
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            st, out = runner(th0, st)
            chunks.append(np.asarray(out))
        wall = time.perf_counter() - t0
        s = np.transpose(np.concatenate(chunks, axis=0), (1, 0, 2))
        series[label] = s
        t_len = s.shape[1]
        ms = wall / t_len * 1e3
        agg = args.citizens * s.shape[0] * t_len / wall
        res[label] = {
            "compile_chunk1_s": round(compile_s, 1),
            "ms_per_ensemble_step": round(ms, 2),
            "steps_run": int(t_len),
            "agg_citizen_steps_per_s_M": round(agg / 1e6),
        }
        print(f"{label}: {ms:.2f} ms/ens-step ({agg / 1e6:.0f}M agg c-s/s)",
              flush=True)

    # sharded runner on the 1-device mesh: same protocol via the library
    # entry (pack+upload+compile excluded by a throwaway warm run)
    t0 = time.perf_counter()
    s3 = run_packed_ensemble_sharded(base, param_list, cfg, n_devices=1,
                                     seed=0)
    wall_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    s3 = np.asarray(run_packed_ensemble_sharded(
        base, param_list, cfg, n_devices=1, seed=0,
    ))
    wall = time.perf_counter() - t0
    t_len = s3.shape[1]
    agg = args.citizens * s3.shape[0] * t_len / wall
    res["sharded_1dev_mesh"] = {
        "cold_wall_s": round(wall_cold, 1),
        "warm_wall_s_incl_repack": round(wall, 1),
        "steps_run": int(t_len),
        "agg_citizen_steps_per_s_M_incl_repack": round(agg / 1e6),
    }
    print(f"sharded_1dev warm wall {wall:.1f}s (incl. re-pack/upload)",
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
