"""Curve-level v1.6 fidelity gate: canonical series vs the seed band.

The scalar gate (docs/FIDELITY.md) checks five quantities; this tool raises
it to curve level per VERDICT r2 #4: for every hour of the canonical v1.6
York artifact (/root/reference/statistics_results/york_stats_results/v1.6/
global_stats.json, 1,427 hourly SEIRV entries), check whether the canonical
infected/vaccinated counts lie inside the [min, max] band of the committed
seed ensemble (sample_results/york_v16/seirv_seed*.npy), and report

* coverage: fraction of hours the canonical curve is inside the seed band
  (per component, and with a +/- tolerance band in hours to absorb the
  documented takeoff-time jitter — peak hours span 801-1090 across seeds,
  so pointwise-in-time coverage alone under-credits phase-shifted but
  shape-identical curves);
* nRMSE: RMS distance between the canonical curve and the closest seed
  curve / the seed median, normalised by the canonical peak.

Writes sample_results/york_v16/curve_gate.json and curve.png (seed band +
canonical overlay).  Pure numpy over committed artifacts — reruns offline.

Usage: python tools/v16_curve_gate.py [--canonical PATH] [--outdir DIR]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

CANONICAL = (
    "/root/reference/statistics_results/york_stats_results/v1.6/"
    "global_stats.json"
)


def load_canonical(path):
    rows = json.load(open(path))
    # drop the trailing all-zero entry (statistics.rs writes one dead row)
    arr = np.array(
        [
            [r["susceptible"], r["exposed"], r["infected"], r["recovered"],
             r["vaccinated"]]
            for r in rows
        ],
        np.int64,
    )
    if arr[-1].sum() == 0:
        arr = arr[:-1]
    return arr


def band_coverage(canon, seeds, comp, shift_h=0):
    """Fraction of hours canonical[:, comp] is inside the seed band,
    allowing the band to be taken over a +/- shift_h window (phase
    tolerance for takeoff-time jitter)."""
    T = min(canon.shape[0], seeds.shape[1])
    c = canon[:T, comp].astype(np.float64)
    s = seeds[:, :T, comp].astype(np.float64)
    lo = s.min(axis=0)
    hi = s.max(axis=0)
    if shift_h:
        # windowed min/max: band over hours [t-shift, t+shift]
        from numpy.lib.stride_tricks import sliding_window_view

        pad_lo = np.pad(lo, shift_h, mode="edge")
        pad_hi = np.pad(hi, shift_h, mode="edge")
        lo = sliding_window_view(pad_lo, 2 * shift_h + 1).min(axis=1)
        hi = sliding_window_view(pad_hi, 2 * shift_h + 1).max(axis=1)
    inside = (c >= lo) & (c <= hi)
    return float(inside.mean()), lo, hi, c


def loo_self_coverage(seeds, comp, T):
    """Leave-one-out pointwise coverage: each seed scored against the band
    of the other seeds over the same horizon the canonical gate uses.
    This is the yardstick for the canonical run's pointwise coverage — if
    the canonical number sits inside this distribution, the residual is
    seed noise (takeoff/trigger-hour jitter), not a fidelity defect."""
    s = seeds[:, :T, comp].astype(np.float64)
    covs = []
    for i in range(s.shape[0]):
        others = np.delete(s, i, axis=0)
        lo, hi = others.min(axis=0), others.max(axis=0)
        covs.append(float(((s[i] >= lo) & (s[i] <= hi)).mean()))
    return np.array(covs)


def nrmse(canon, seeds, comp):
    T = min(canon.shape[0], seeds.shape[1])
    c = canon[:T, comp].astype(np.float64)
    s = seeds[:, :T, comp].astype(np.float64)
    scale = max(c.max(), 1.0)
    per_seed = np.sqrt(((s - c) ** 2).mean(axis=1)) / scale
    med = np.median(s, axis=0)
    return {
        "vs_median": float(np.sqrt(((med - c) ** 2).mean()) / scale),
        "closest_seed": float(per_seed.min()),
        "mean_seed": float(per_seed.mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--canonical", default=CANONICAL)
    ap.add_argument("--outdir", default="sample_results/york_v16")
    args = ap.parse_args()

    canon = load_canonical(args.canonical)
    paths = sorted(glob.glob(os.path.join(args.outdir, "seirv_seed*.npy")))
    if not paths:
        raise SystemExit(f"no seed curves in {args.outdir}")
    seeds = np.stack([np.load(p) for p in paths])  # (S, 2600, 5)

    comps = {"infected": 2, "vaccinated": 4, "recovered": 3}
    report = {
        "n_seeds": len(paths),
        "canonical_hours": int(canon.shape[0]),
        "canonical": args.canonical,
    }
    for name, comp in comps.items():
        cov0, lo, hi, c = band_coverage(canon, seeds, comp, shift_h=0)
        cov24 = band_coverage(canon, seeds, comp, shift_h=24)[0]
        cov72 = band_coverage(canon, seeds, comp, shift_h=72)[0]
        T = min(canon.shape[0], seeds.shape[1])
        self_cov = loo_self_coverage(seeds, comp, T)
        report[name] = {
            "coverage_pointwise": round(cov0, 4),
            "coverage_phase24h": round(cov24, 4),
            "coverage_phase72h": round(cov72, 4),
            # the seed band's own leave-one-out pointwise coverage —
            # the canonical run is indistinguishable from a band member
            # when its coverage sits inside this distribution
            "self_coverage_loo": {
                "min": round(float(self_cov.min()), 4),
                "p25": round(float(np.percentile(self_cov, 25)), 4),
                "median": round(float(np.median(self_cov)), 4),
                "max": round(float(self_cov.max()), 4),
                "seeds_below_canonical": int((self_cov < cov0).sum()),
            },
            "nrmse": {k: round(v, 4) for k, v in nrmse(
                canon, seeds, comp).items()},
        }

    out_json = os.path.join(args.outdir, "curve_gate.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))

    # --- plot: seed band + individual seeds (muted) + canonical (slot-1) ---
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    T = min(canon.shape[0], seeds.shape[1])
    t = np.arange(T)
    fig, axes = plt.subplots(1, 2, figsize=(12, 4.2), dpi=140)
    fig.patch.set_facecolor("#fcfcfb")
    for ax, (name, comp) in zip(axes, (("infected", 2), ("vaccinated", 4))):
        s = seeds[:, :T, comp]
        ax.set_facecolor("#fcfcfb")
        ax.fill_between(
            t, s.min(axis=0), s.max(axis=0),
            color="#2a78d6", alpha=0.14, linewidth=0,
            label=f"{seeds.shape[0]}-seed band",
        )
        for row in s:
            ax.plot(t, row, color="#9aa3ad", linewidth=0.5, alpha=0.5)
        ax.plot(
            t, canon[:T, comp], color="#2a78d6", linewidth=2,
            label="v1.6 canonical",
        )
        ax.set_title(f"York v1.6: {name}", color="#0b0b0b", fontsize=11)
        ax.set_xlabel("hour", color="#52514e")
        ax.set_ylabel("citizens", color="#52514e")
        ax.tick_params(colors="#52514e")
        for sp in ("top", "right"):
            ax.spines[sp].set_visible(False)
        for sp in ("left", "bottom"):
            ax.spines[sp].set_color("#d9d8d3")
        ax.grid(color="#edece8", linewidth=0.6)
        ax.set_axisbelow(True)
        ax.legend(frameon=False, fontsize=9, labelcolor="#0b0b0b")
    fig.tight_layout()
    out_png = os.path.join(args.outdir, "curve.png")
    fig.savefig(out_png, facecolor=fig.get_facecolor())
    print(f"wrote {out_json} and {out_png}")


if __name__ == "__main__":
    main()
