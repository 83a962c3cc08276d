"""Calibrate + validate the v1.6 fidelity gate on the census-like York world.

Modes:
  python tools/probe_v16.py growth [scale ...]   # growth rate r vs exposure scale
  python tools/probe_v16.py v171                 # full run, v1.7.1 params, vs artifact
  python tools/probe_v16.py v16 [n_seeds]        # multi-seed v1.6 ensemble envelope

Reference targets (measured, see docs/FIDELITY.md):
  v1.6 canonical artifact (statistics_results/york_stats_results/v1.6):
      peak 89,170 infected @ hour 946, pre-intervention r ~ 0.015-0.018/h
  v1.7.1 artifact: peak 2,315 @ hour 1237, r ~ 0.0039/h
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from epidemicsimulator_tpu.config import (  # noqa: E402
    DiseaseParams,
    InterventionThresholds,
    Params,
    SimConfig,
)
from epidemicsimulator_tpu.engine.simulator import Simulator  # noqa: E402
from epidemicsimulator_tpu.world.census_like import (  # noqa: E402
    generate_census_like_world,
)

YORK_N, YORK_OA = 197_603, 637


def york_world(seed=42):
    return generate_census_like_world(YORK_N, YORK_OA, seed=seed)


def fit_growth(seirv, lo=30, hi=4000):
    inf = seirv[:, 2].astype(float)
    t = np.arange(len(inf))
    peak_t = int(inf.argmax())
    m = (inf >= lo) & (inf <= hi) & (t <= peak_t)
    if m.sum() < 10:
        return float("nan")
    return float(np.polyfit(t[m], np.log(inf[m]), 1)[0])


def run(world, params, seed, max_steps=5000, chunk=500):
    sim = Simulator(
        world, params, SimConfig(max_steps=max_steps, chunk_size=chunk),
        seed=seed, verbose=False,
    )
    return np.asarray(sim.simulate())


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "growth"
    w = york_world()

    if mode == "growth":
        scales = [float(s) for s in sys.argv[2:]] or [1.0, 2.0, 3.0, 4.0, 5.0]
        for s in scales:
            p = Params(
                DiseaseParams(exposure_chance=0.00055 * s),
                # disable everything: measure the raw pre-intervention rate
                InterventionThresholds(
                    lockdown=-1.0, vaccination=-1.0,
                    mask_public_transport=-1.0, mask_everywhere=-1.0,
                ),
            )
            seirv = run(w, p, seed=1, max_steps=2500)
            r = fit_growth(seirv)
            peak = seirv[:, 2].max()
            print(
                json.dumps(
                    {"scale": s, "chance": 0.00055 * s, "r_per_h": round(r, 5),
                     "doubling_h": round(0.693 / r, 1) if r > 0 else None,
                     "peak": int(peak), "peak_h": int(seirv[:, 2].argmax()),
                     "steps": len(seirv)}
                )
            )

    elif mode == "v171":
        seirv = run(w, Params.covid(), seed=1)
        r = fit_growth(seirv, hi=1900)
        print(json.dumps({
            "r_per_h": round(r, 5),
            "peak": int(seirv[:, 2].max()),
            "peak_h": int(seirv[:, 2].argmax()),
            "final_R": int(seirv[-1, 3]), "final_V": int(seirv[-1, 4]),
            "steps": len(seirv),
            "target": {"peak": 2315, "peak_h": 1237, "r": 0.0039},
        }))

    elif mode == "cal":
        # Full v1.6-threshold runs at given exposure chances: the real gate
        # is (peak, peak_h, attack split), not the raw growth rate.
        chances = [float(s) for s in sys.argv[2:]] or [0.011, 0.022, 0.044]
        base = Params.covid_v16()
        for c in chances:
            p = Params(
                DiseaseParams(exposure_chance=c,
                              vaccination_rate=base.disease.vaccination_rate),
                base.thresholds,
            )
            seirv = run(w, p, seed=1)
            inf = seirv[:, 2]
            pop = seirv[0].sum()
            vs = np.flatnonzero(seirv[:, 4] > 0)
            trig = {}
            if len(vs):
                h = int(vs[0])
                row = seirv[h]
                trig = {
                    "trig_h": h, "trig_E_over_I": round(row[1] / max(row[2], 1), 3),
                    "trig_everinf_frac": round(float(row[1:4].sum() / pop), 4),
                    "trig_R": int(row[3]),
                }
            print(json.dumps({
                "chance": c, "peak": int(inf.max()),
                "peak_h": int(inf.argmax()),
                "r": round(fit_growth(seirv, hi=20000), 5),
                "end_h": len(seirv),
                "final_R_frac": round(float(seirv[-1, 3] / pop), 4),
                "final_V_frac": round(float(seirv[-1, 4] / pop), 4),
                "final_S": int(seirv[-1, 0]),
                **trig,
                "target": {"peak": 89170, "peak_h": 946, "end": 1426,
                           "R_frac": 0.5145, "V_frac": 0.4855,
                           "trig": {"h": 850, "E_over_I": 0.568,
                                    "everinf": 0.520, "R": 6857}},
            }), flush=True)

    elif mode == "v16":
        # v16 [n_seeds] [seed_offset]: appends per-seed rows + padded SEIRV
        # curves to sample_results/york_v16/ so batches accumulate.
        import os

        n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        off = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        outdir = "sample_results/york_v16"
        os.makedirs(outdir, exist_ok=True)
        rows = []
        rows_path = f"{outdir}/seeds.jsonl"
        for seed in range(off, off + n_seeds):
            wrld = york_world(seed=42 + seed % 4)  # vary world + sim seeds
            seirv = run(wrld, Params.covid_v16(), seed=seed)
            inf = seirv[:, 2]
            rows.append({
                "seed": seed, "peak": int(inf.max()),
                "peak_h": int(inf.argmax()),
                "r": round(fit_growth(seirv, hi=20000), 5),
                "attack": int(seirv[-1, 3] + seirv[-1, 2] + seirv[-1, 1]),
                "max_V": int(seirv[:, 4].max()),
                "steps": len(seirv),
            })
            with open(rows_path, "a") as f:
                f.write(json.dumps(rows[-1]) + "\n")
            pad = np.zeros((2600, 5), np.int64)
            pad[: min(len(seirv), 2600)] = seirv[:2600]
            pad[len(seirv):, 3:] = seirv[-1, 3:]  # hold terminal R/V
            np.save(f"{outdir}/seirv_seed{seed}.npy", pad)
            print(json.dumps(rows[-1]), flush=True)
        peaks = [r["peak"] for r in rows]
        hours = [r["peak_h"] for r in rows]
        print(json.dumps({
            "peak_range": [min(peaks), max(peaks)],
            "peak_h_range": [min(hours), max(hours)],
            "target": {"peak": 89170, "peak_h": 946},
        }))
        # regenerate summary.json from the FULL accumulated seeds.jsonl so
        # the committed envelope always reflects every committed seed
        all_rows = [json.loads(l) for l in open(rows_path)]
        rng = lambda k: [min(r[k] for r in all_rows),
                         max(r[k] for r in all_rows)]
        tgt = {"peak": 89170, "peak_h": 946, "attack_final_R": 101677,
               "final_V": 95944, "end_h": 1426}
        summary = {
            "params": "Params.covid_v16() (exposure_chance=0.003, vax "
                      "5100/step, thresholds .20/.30/.40/.60)",
            "world": "census-like York (197,603 citizens, 637 OAs, mega "
                     "sites on), world seed 42+s%4, sim seed s",
            "n_seeds": len(all_rows),
            "peak_range": rng("peak"),
            "peak_h_range": rng("peak_h"),
            "attack_range": rng("attack"),
            "max_V_range": rng("max_V"),
            "end_h_range": rng("steps"),
            "target_v16_canonical": tgt,
            "inside_envelope": {
                "peak": rng("peak")[0] <= tgt["peak"] <= rng("peak")[1],
                "peak_h": rng("peak_h")[0] <= tgt["peak_h"]
                <= rng("peak_h")[1],
                "attack": rng("attack")[0] <= tgt["attack_final_R"]
                <= rng("attack")[1],
                "max_V": rng("max_V")[0] <= tgt["final_V"]
                <= rng("max_V")[1],
                "end_h": rng("steps")[0] <= tgt["end_h"] <= rng("steps")[1],
            },
        }
        with open(f"{outdir}/summary.json", "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary["inside_envelope"]))


if __name__ == "__main__":
    main()
