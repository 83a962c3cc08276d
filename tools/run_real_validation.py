"""Validate the simulation against York's REAL pandemic data — VERDICT r4 #3.

The reference ships York's actual gov.uk series (cases by specimen date,
first/second/third-dose vaccinations) and eyeballs them in
``reference_data/reference_graphs.ipynb``; no quantitative comparison
exists anywhere in its repo.  This tool is the quantitative counterpart:

1. Per-capita comparison of the committed 32-seed v1.6 band
   (sample_results/york_v16/seirv_seed*.npy) against the real series —
   daily-incidence wave shape (peak per-100k, FWHM, attack rate) vs the
   largest real 120-day wave and the spring-2020 first wave, and the
   sim's vaccination rollout vs the real first-dose campaign.
2. (--calibrate, needs a device) Fit exposure_chance against the real
   wave through data/realworld.py::target_from_daily_cases at
   ascertainment 1.0 and 0.25 — completing the dissertation's actual
   workflow (simulate -> compare to gov.uk -> re-tune) in one command.

Writes sample_results/real_validation/{summary.json, curves.png}.
docs/FIDELITY.md "Against reality" states the findings.

Usage:
  python tools/run_real_validation.py            # artifact comparison
  python tools/run_real_validation.py --calibrate  # + TPU/device fits
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

REF = "/root/reference/reference_data/York"
OUT = "sample_results/real_validation"
SIM_POP = 197_603  # census-like York world (sample_results/york_v16)


def band_comparison():
    from epidemicsimulator_tpu.data.realworld import (
        YORK_POPULATION_2011,
        daily_cases,
        daily_first_doses,
        largest_wave,
        sim_daily_incidence,
        sim_vaccination_metrics,
        vaccination_rollout_metrics,
        wave_metrics,
    )

    dates, cases = daily_cases(os.path.join(REF, "cases.csv"))
    vdates, cum1 = daily_first_doses(os.path.join(REF, "vaccinations.csv"))

    seeds = sorted(glob.glob("sample_results/york_v16/seirv_seed*.npy"))
    assert len(seeds) >= 16, "committed v1.6 seed band missing"
    sim_daily = [sim_daily_incidence(np.load(p)) for p in seeds]
    sim_metrics = [wave_metrics(d, SIM_POP) for d in sim_daily]

    w_big = largest_wave(dates, cases, window_days=120)
    # spring-2020 "first wave": the first 120 days of the series
    w_first = slice(0, 120)
    real_big = wave_metrics(
        np.nan_to_num(cases[w_big]), YORK_POPULATION_2011
    )
    real_big["window"] = [str(dates[w_big][0]), str(dates[w_big][-1])]
    real_first = wave_metrics(
        np.nan_to_num(cases[w_first]), YORK_POPULATION_2011
    )
    real_first["window"] = [str(dates[w_first][0]), str(dates[w_first][-1])]

    def band(key):
        vals = [m[key] for m in sim_metrics]
        return [min(vals), max(vals)]

    summary = {
        "sim": {
            "n_seeds": len(seeds),
            "population": SIM_POP,
            "peak_daily_per_100k_range": band("peak_daily_per_100k"),
            "attack_pct_range": band("attack_pct"),
            "fwhm_days_range": band("fwhm_days"),
            "vaccination": sim_vaccination_metrics(
                np.load(seeds[0]), SIM_POP
            ),
        },
        "real": {
            "population": YORK_POPULATION_2011,
            "series_days": int(len(dates)),
            "total_cases": int(np.nansum(cases)),
            "largest_wave": real_big,
            "first_wave_120d": real_first,
            "vaccination_first_dose": vaccination_rollout_metrics(
                vdates, cum1, YORK_POPULATION_2011
            ),
        },
    }

    # ratios the FIDELITY section quotes
    sim_peak_mid = float(np.median(
        [m["peak_daily_per_100k"] for m in sim_metrics]
    ))
    summary["gap"] = {
        "peak_incidence_ratio_sim_over_real_largest": round(
            sim_peak_mid / real_big["peak_daily_per_100k"], 1
        ),
        "sim_attack_pct_median": float(np.median(
            [m["attack_pct"] for m in sim_metrics]
        )),
        "real_total_cases_pct_of_pop": round(
            100.0 * np.nansum(cases) / YORK_POPULATION_2011, 2
        ),
        "vax_peak_rate_ratio_sim_over_real": round(
            summary["sim"]["vaccination"]["peak_daily_per_100k"]
            / summary["real"]["vaccination_first_dose"]
            ["peak_daily_per_100k"], 1
        ),
    }

    # plot: per-capita daily incidence, sim band vs both real waves,
    # peak-aligned day axis
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 5))
    L = max(len(d) for d in sim_daily)
    grid = np.full((len(sim_daily), L), np.nan)
    for i, d in enumerate(sim_daily):
        grid[i, : len(d)] = 1e5 * d / SIM_POP
    peak_mid = int(np.nanargmax(np.nanmedian(grid, axis=0)))
    x_sim = np.arange(L) - peak_mid
    ax1.fill_between(
        x_sim, np.nanmin(grid, axis=0), np.nanmax(grid, axis=0),
        alpha=0.25, color="tab:blue", label="sim 32-seed band",
    )
    ax1.plot(x_sim, np.nanmedian(grid, axis=0), color="tab:blue", lw=1.5,
             label="sim median")
    for w, name, color in ((w_big, "real largest wave", "tab:red"),
                           (w_first, "real first wave", "tab:orange")):
        c = 1e5 * np.nan_to_num(cases[w]) / YORK_POPULATION_2011
        ax1.plot(np.arange(len(c)) - int(np.argmax(c)), c, color=color,
                 lw=1.5, label=name)
    ax1.set_yscale("log")
    ax1.set_ylim(bottom=0.1)
    ax1.set_xlabel("days from wave peak")
    ax1.set_ylabel("daily new cases per 100k (log)")
    ax1.set_title("Epidemic wave: simulated (v1.6 params) vs observed")
    ax1.legend(loc="upper right", fontsize=8)

    v_sim = np.load(seeds[0])[:, 4] / SIM_POP * 100
    ax2.plot(np.arange(len(v_sim)) / 24.0, v_sim, color="tab:blue",
             label="sim V (single run)")
    cum = np.nan_to_num(cum1) / YORK_POPULATION_2011 * 100
    ax2.plot(np.arange(len(cum)), cum, color="tab:red",
             label="real first doses")
    ax2.set_xlabel("days from series start")
    ax2.set_ylabel("% of population vaccinated")
    ax2.set_title("Vaccination rollout")
    ax2.legend(loc="lower right", fontsize=8)
    fig.tight_layout()
    os.makedirs(OUT, exist_ok=True)
    fig.savefig(os.path.join(OUT, "curves.png"), dpi=110)
    print(f"wrote {OUT}/curves.png", flush=True)
    return summary, dates, cases, w_big


def calibrate_to_reality(dates, cases, w_big):
    from epidemicsimulator_tpu import Params, SimConfig
    from epidemicsimulator_tpu.calibrate import calibrate
    from epidemicsimulator_tpu.data.realworld import (
        YORK_POPULATION_2011, target_from_daily_cases,
    )
    from epidemicsimulator_tpu.utils import enable_compilation_cache
    from epidemicsimulator_tpu.world.census_like import (
        generate_census_like_world,
    )

    enable_compilation_cache()
    import jax

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)
    world = generate_census_like_world(SIM_POP, 637, seed=42)

    wave = np.nan_to_num(cases[w_big])
    fits = {}
    for asc in (1.0, 0.25):
        target = target_from_daily_cases(
            wave, SIM_POP, ascertainment=asc
        )
        cfg = SimConfig(max_steps=len(target), chunk_size=240,
                        record_exposures_per_oa=False)
        t0 = time.perf_counter()
        r = calibrate(
            world, Params.covid_v16(), cfg, target,
            param="exposure_chance", bounds=(2e-4, 6e-3),
            replicates=12, rounds=2, seed=1,
        )
        r["wall_s"] = round(time.perf_counter() - t0, 1)
        r["ascertainment"] = asc
        fits[str(asc)] = r
        print(f"ascertainment {asc}: exposure_chance={r['value']:.5g} "
              f"score={r['score']['score']:.3f}", flush=True)
    return fits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calibrate", action="store_true")
    args = ap.parse_args()

    summary, dates, cases, w_big = band_comparison()
    if args.calibrate:
        summary["calibration_to_real_wave"] = calibrate_to_reality(
            dates, cases, w_big
        )
    summary["note"] = (
        "Reference-faithful v1.6 parameters model an UNMITIGATED single "
        "wave: they overshoot observed case curves by construction "
        "(observed data embeds real-world NPIs, immunity and "
        "under-ascertainment the faithful run deliberately omits). The "
        "quantified gap + the ascertainment-swept calibration bound how "
        "far; docs/FIDELITY.md 'Against reality' interprets."
    )
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
