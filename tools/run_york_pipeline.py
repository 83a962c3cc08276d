"""York-scale run of the REAL CLI data path, end to end (VERDICT r2 next #5).

Generates a full offline data-directory fixture at York scale (637 OAs,
~197.5k citizens — BASELINE.md York row) with tools/gen_fixture.py, then
drives `epidemicsimulator_tpu.cli.main` exactly as a user would:

    parse census CSVs -> parse PBF -> WGS84->OSGB36 -> dedupe ->
    polygon assignment -> build_world (8 phases) -> simulate -> artifacts

and commits the four reference JSON artifacts + builder phase timings to
sample_results/york_pipeline/.  The reference's equivalent run is the
Viking York job: 197,603 citizens / 637 OAs, init 284.7s, total 343.0s
(epidemic_sim_v1.6_17739074.log; simulator_builder.rs:1162-1292).

Usage: python tools/run_york_pipeline.py [--steps 5000] [--oas 637]
"""

import argparse
import json
import os
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/york_fixture")
    ap.add_argument("--out", default="sample_results/york_pipeline")
    ap.add_argument("--oas", type=int, default=637)
    ap.add_argument("--pop", type=int, default=310)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    from gen_fixture import write_fixture

    t0 = time.perf_counter()
    pbf, shp, codes = write_fixture(
        args.dir, n_oas=args.oas, pop_per_oa=args.pop, seed=0
    )
    fixture_s = time.perf_counter() - t0
    print(f"fixture: {len(codes)} OAs in {fixture_s:.1f}s", flush=True)

    from epidemicsimulator_tpu.cli import main as cli_main

    sim_out = os.path.join(args.dir, "sim_out")
    t0 = time.perf_counter()
    rc = cli_main([
        "york_pipeline",
        "--directory", args.dir,
        "--pbf", pbf,
        "--shapefile", shp,
        "--simulate",
        "--max-steps", str(args.steps),
        "--seed", str(args.seed),
        "--output-name", sim_out,
    ])
    total_s = time.perf_counter() - t0
    assert rc == 0, f"cli exited {rc}"

    os.makedirs(args.out, exist_ok=True)
    for name in ("global_stats.json", "exposures.json", "timings.json",
                 "memory.json"):
        shutil.copy(os.path.join(sim_out, name), os.path.join(args.out, name))

    # builder phase timings persisted by the CLI next to the world cache
    tpath = None
    for p in pathlib.Path(args.dir).glob("*.build_timings.json"):
        tpath = p
    build_timings = json.load(open(tpath)) if tpath else {}

    stats = json.load(open(os.path.join(args.out, "global_stats.json")))
    first, last = stats[0], stats[-2] if len(stats) > 1 else stats[-1]
    n_citizens = sum(
        first[k] for k in
        ("susceptible", "exposed", "infected", "recovered", "vaccinated")
    )
    peak = max(s["infected"] for s in stats)
    summary = {
        "what": "real CLI data path at York scale (gen_fixture inputs)",
        "n_output_areas": len(codes),
        "n_citizens": n_citizens,
        "steps_run": len(stats) - 1,
        "peak_infected": peak,
        "final": {k: last[k] for k in
                  ("susceptible", "exposed", "infected", "recovered",
                   "vaccinated")},
        "fixture_gen_s": round(fixture_s, 1),
        "cli_total_s": round(total_s, 1),
        "builder_phase_s": build_timings,
        "reference_york": {
            "n_citizens": 197603, "n_output_areas": 637,
            "init_s": 284.7, "total_s": 343.0,
            "source": "epidemic_sim_v1.6_17739074.log",
        },
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
