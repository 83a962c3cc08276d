"""Partition the FULL-UK 63M world and run a sharded chunk virtually.

VERDICT r3 #3: the BASELINE target row ("full UK runs sharded with
cross-shard commuting, v5p-16") had no direct evidence above 3.46M.  This
probe (a) builds the 63M world host-side, (b) runs `partition_world` at 8
and 16 devices recording shard balance / cross-shard workers / ghost G /
a2a volume for the PERF.md comm table, and (c) executes one short chunk of
the partitioned 63M world through the sharded runner on the virtual 8-CPU
mesh — proving the UK-scale sharded path compiles and steps without 8
real chips.  Host-only: forces the CPU platform, never touches the TPU.

Writes sample_results/uk_partition/summary.json.

Usage: python tools/probe_uk_partition.py [--n 63000000] [--run-steps 2]
"""

import argparse
import json
import os
import resource
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=16"
    ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=63_000_000)
    ap.add_argument("--oas", type=int, default=227_759)
    ap.add_argument("--devices", default="8,16")
    ap.add_argument("--run-steps", type=int, default=2,
                    help="steps of the virtual 8-device chunk (0 = skip)")
    ap.add_argument("--out", default="sample_results/uk_partition")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.parallel.partition import partition_world

    summary = {"n_citizens": args.n, "n_output_areas": args.oas,
               "host": "1-core CPU, 125GB RAM", "partitions": {}}

    t0 = time.perf_counter()
    world = generate_synthetic_world(args.n, n_output_areas=args.oas, seed=0)
    t_build = time.perf_counter() - t0
    summary["world_build_host_s"] = round(t_build, 1)
    summary["rss_after_world_gb"] = round(rss_gb(), 1)
    print(f"world built host-side in {t_build:.1f}s "
          f"(rss {rss_gb():.1f} GB)", flush=True)

    kept = {}
    for d in [int(x) for x in args.devices.split(",")]:
        st: dict = {}
        t0 = time.perf_counter()
        sw = partition_world(world, d, stats=st)
        st["partition_s"] = round(time.perf_counter() - t0, 1)
        st["rss_gb"] = round(rss_gb(), 1)
        summary["partitions"][str(d)] = st
        print(f"partition d={d}: {st}", flush=True)
        if d in (8, 16):
            kept[d] = sw
        else:
            del sw

    for d, sw_d in kept.items():
        if not args.run_steps:
            break
        from epidemicsimulator_tpu.parallel.fastmesh import (
            init_sharded_state, make_fast_sharded_runner,
        )
        from epidemicsimulator_tpu.parallel.mesh import make_mesh

        assert len(jax.devices()) >= d, jax.devices()
        mesh = make_mesh(d)
        cfg = SimConfig(max_steps=args.run_steps,
                        chunk_size=args.run_steps,
                        record_exposures_per_oa=False)
        t0 = time.perf_counter()
        state = init_sharded_state(world, sw_d, seed=0,
                                   starting_infected=360_000, cfg=cfg)
        runner = make_fast_sharded_runner(sw_d, cfg, mesh)
        params = Params.covid().as_arrays()
        state, out = runner(sw_d, params, state)
        seirv = np.asarray(out.seirv)
        t_run = time.perf_counter() - t0
        assert int(seirv[-1].sum()) == args.n, seirv[-1]
        summary[f"virtual_{d}dev_chunk"] = {
            "steps": args.run_steps,
            "compile_plus_run_s": round(t_run, 1),
            "final_seirv": seirv[-1].tolist(),
            "census_conserved": True,
            "rss_gb": round(rss_gb(), 1),
        }
        print(f"virtual {d}-dev chunk ({args.run_steps} steps) in "
              f"{t_run:.1f}s; final {seirv[-1].tolist()}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", os.path.join(args.out, "summary.json"), flush=True)


if __name__ == "__main__":
    main()
