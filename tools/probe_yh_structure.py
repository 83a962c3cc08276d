"""Region-structure sensitivity of the Y&H anatomy — r5 follow-up.

yh_log_gate.py measured the fixture-vs-real-region gap: the reference's
real-census Y&H run grew its epidemic faster than the parametric fixture
(peak 53.2% vs 49.9%, attack 55.7% vs 52.4%, V 44.3% vs 48.5%).  This
probe varies ONE commuting-structure knob per arm and reruns the
pipeline (seed 1), quantifying which structural axis moves the anatomy
toward the reference — a sensitivity analysis the reference (one region,
one build) could never run.

Arms: baseline (the York-validated mixture), hub dispersion
(n_hubs 10->40), commuting intensity (self_fraction 0.25->0.15), mixing
radius (commute_decay 3->6).

Writes sample_results/yh_pipeline/structure_sensitivity.json.

Usage: python tools/probe_yh_structure.py [--steps 5000]
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

REF = {"peak_I_frac": 0.5319, "attack_frac": 0.5568, "max_V_frac": 0.4432,
       "peak_step": 1101}  # yh_log_gate.py::reference_anatomy
ARMS = {
    "baseline": {},
    "hub_dispersion_40": {"n_hubs": 40},
    "commute_intensity_self015": {"self_fraction": 0.15},
    "mixing_radius_decay6": {"commute_decay": 6.0},
    # workplace-size axis (r5 follow-up: the commuting knobs above are
    # all <=2.1pp — the finding predicts the residual lives here)
    "hub_fraction_030": {"hub_fraction": 0.30},
    "fewer_bigger_workplaces_3": {"workplaces_per_oa": 3},
}


def run_arm(name, kw, args):
    from gen_fixture import write_fixture

    from epidemicsimulator_tpu.cli import main as cli_main
    from epidemicsimulator_tpu.config import Params

    d = f"/tmp/yh_struct_{name}"
    t0 = time.perf_counter()
    pbf, shp, codes = write_fixture(
        d, n_oas=15_669, pop_per_oa=221, seed=0, **kw
    )
    fixture_s = time.perf_counter() - t0
    params_file = os.path.join(d, "params_v16.json")
    Params.covid_v16().to_json(params_file)
    sim_out = os.path.join(d, "sim_out")
    t0 = time.perf_counter()
    rc = cli_main([
        "yh_struct", "--directory", d, "--pbf", pbf, "--shapefile", shp,
        "--simulate", "--max-steps", str(args.steps), "--seed", "1",
        "--params-file", params_file, "--output-name", sim_out,
    ])
    assert rc == 0
    cli_s = time.perf_counter() - t0
    stats = json.load(open(os.path.join(sim_out, "global_stats.json")))
    arr = np.array(
        [[r["susceptible"], r["exposed"], r["infected"], r["recovered"],
          r["vaccinated"]] for r in stats], np.int64
    )
    if arr[-1].sum() == 0:
        arr = arr[:-1]
    pop = int(arr[0].sum())
    out = {
        "knobs": kw,
        "population": pop,
        "peak_I_frac": round(float(arr[:, 2].max()) / pop, 4),
        "peak_hour": int(arr[:, 2].argmax()),
        "attack_frac": round(float(arr[-1, 3]) / pop, 4),
        "max_V_frac": round(float(arr[:, 4].max()) / pop, 4),
        "fixture_s": round(fixture_s, 1),
        "cli_s": round(cli_s, 1),
    }
    # clean the ~1 GB of fixture + cache per arm
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--arms", default=None,
                    help="comma list to run (others kept from the "
                    "existing artifact)")
    args = ap.parse_args()

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    _ = int(jax.numpy.arange(8).sum())

    out_path = "sample_results/yh_pipeline/structure_sensitivity.json"
    report = {"reference_anatomy": REF, "arms": {}}
    if args.arms and os.path.exists(out_path):
        report = json.load(open(out_path))
    wanted = (
        set(a.strip() for a in args.arms.split(",")) if args.arms
        else set(ARMS)
    )
    for name, kw in ARMS.items():
        if name not in wanted:
            continue
        t0 = time.perf_counter()
        report["arms"][name] = run_arm(name, kw, args)
        print(f"{name}: {json.dumps(report['arms'][name])} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

    # distance to the reference anatomy (L1 over the three fractions)
    for name, a in report["arms"].items():
        a["l1_to_reference"] = round(
            abs(a["peak_I_frac"] - REF["peak_I_frac"])
            + abs(a["attack_frac"] - REF["attack_frac"])
            + abs(a["max_V_frac"] - REF["max_V_frac"]), 4
        )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
