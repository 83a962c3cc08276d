"""Quantify the ONE sharded-vs-single divergence: bus assembly.

Since every citizen-keyed draw is hashed on (step seed, global id), the
sharded fast path reproduces single-device trajectories bitwise except for
bus composition (buses assemble per home shard; the reference-semantics
shuffle+chunk is shard-local, parallel/fastmesh.py).  Any SEIRV delta
measured here is therefore PURELY the bus shard-boundary term.

Two modes:

* mesh mode (default) — the ground truth at small scale: single fastpath vs
  the REAL 8-device sharded path on the virtual CPU mesh.
      JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/probe_bus_divergence.py --seeds 6 --citizens 40000

* --emulate S — the same quantity at FULL Y&H scale on one TPU chip
  (VERDICT r2 next #7: the <1% claim must be supported at the scale it is
  quoted for).  Shard-local bus assembly is emulated exactly by re-keying
  the bus sort: fastmesh sorts each shard's riders by (route, fresh tie),
  which partitions riders into (shard, route) cells before capacity-20
  chunking; a single-device run whose route key is
  ``route * S + home_shard(rider)`` produces the identical cell partition
  (partition_world's household-aligned contiguous cuts give the shard map),
  with iid tie draws — i.e. the same bus-composition law, measured without
  an 8-chip machine.  --validate cross-checks the emulation against the
  real mesh at small scale (deltas from BOTH pairings are same-magnitude).

      python tools/probe_bus_divergence.py --emulate 8 \
          --citizens 3457142 --oas 15669 --steps 1500 --seeds 6
"""

import argparse
import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

if "cpu" in __import__("os").environ.get("JAX_PLATFORMS", "").lower():
    jax.config.update("jax_platforms", "cpu")

from epidemicsimulator_tpu import (  # noqa: E402
    Params, SimConfig, generate_synthetic_world,
)
from epidemicsimulator_tpu.engine.scan import make_chunk_runner  # noqa: E402
from epidemicsimulator_tpu.engine.state import init_state  # noqa: E402


def curve_stats(seirv):
    inf = seirv[:, 2]
    return {
        "peak": int(inf.max()),
        "peak_h": int(inf.argmax()),
        "attack": int(seirv[-1, 1:4].sum()),
    }


def shard_of_citizens(world, n_shards):
    """partition_world's household-aligned contiguous cuts (citizen->shard)."""
    n = world.n_citizens
    hb = np.asarray(world.home_building, np.int64)
    starts = np.flatnonzero(np.r_[True, hb[1:] != hb[:-1]])
    cuts = [0]
    for d in range(1, n_shards):
        j = int(np.searchsorted(starts, d * n // n_shards))
        cuts.append(int(starts[min(j, len(starts) - 1)]))
    cuts.append(n)
    return np.repeat(np.arange(n_shards), np.diff(np.asarray(cuts)))


def emulate_shard_routes(world, n_shards):
    """World copy whose bus sort key partitions riders into the sharded
    path's (home shard, route) cells — single-device emulation of
    shard-local bus assembly."""
    shard = shard_of_citizens(world, n_shards)
    rp = np.asarray(world.rider_perm, np.int64)
    route = np.asarray(world.rider_route, np.int64)
    emul = route * n_shards + shard[rp]
    assert emul.size == 0 or emul.max() < 2**31
    return dataclasses.replace(
        world, rider_route=np.asarray(emul, route.dtype)
    )


def run_single(world, params, cfg, seed, starting_infected, steps, chunk):
    st = init_state(world, seed=seed, starting_infected=starting_infected)
    runner = make_chunk_runner(world.device_put(), cfg)
    p = params.as_arrays()
    rows = []
    for _ in range(steps // chunk):
        st, out = runner(p, st)
        rows.append(np.asarray(out.seirv))
        if rows[-1][-1, 1:3].sum() == 0:
            break
    return np.concatenate(rows)


def delta_row(seed, a, b, label_a, label_b, curves=None):
    t = min(len(a), len(b))
    s1, s2 = curve_stats(a[:t]), curve_stats(b[:t])
    return {
        "seed": seed,
        label_a: s1,
        label_b: s2,
        "peak_delta_pct": round(
            100 * (s2["peak"] - s1["peak"]) / max(s1["peak"], 1), 3),
        "attack_delta_pct": round(
            100 * (s2["attack"] - s1["attack"]) / max(s1["attack"], 1), 3),
        "max_step_seirv_linf": int(np.abs(a[:t] - b[:t]).max()),
    }


def summarize(deltas, extra=None):
    pk = [abs(d["peak_delta_pct"]) for d in deltas]
    at = [abs(d["attack_delta_pct"]) for d in deltas]
    out = {
        "abs_peak_delta_pct": {"mean": round(float(np.mean(pk)), 3),
                               "max": round(float(np.max(pk)), 3)},
        "abs_attack_delta_pct": {"mean": round(float(np.mean(at)), 3),
                                 "max": round(float(np.max(at)), 3)},
    }
    if extra:
        out.update(extra)
    return out


def divergence_params():
    """Aggressive enough that the epidemic runs its course quickly with
    buses live throughout (20% transport usage in the synthetic world)."""
    base = Params.covid()
    return Params(
        dataclasses.replace(base.disease, exposure_chance=0.02,
                            vaccination_rate=50),
        dataclasses.replace(base.thresholds, lockdown=0.30, vaccination=0.10,
                            mask_public_transport=0.02, mask_everywhere=0.15),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--citizens", type=int, default=40_000)
    ap.add_argument("--oas", type=int, default=24)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--emulate", type=int, default=0, metavar="S",
                    help="single-device emulation of S-shard bus assembly")
    ap.add_argument("--validate", action="store_true",
                    help="mesh mode: also run the emulated arm so the "
                         "emulation is cross-checked against the real mesh")
    ap.add_argument("--starting-infected", type=int, default=None)
    ap.add_argument("--out", default=None,
                    help="write {rows, summary} JSON here")
    args = ap.parse_args()

    params = divergence_params()
    cfg = SimConfig(max_steps=args.steps, chunk_size=args.chunk)
    seed0 = args.starting_infected
    if seed0 is None:
        seed0 = max(40, args.citizens // 1000)

    deltas, deltas_emul = [], []
    for seed in range(args.seeds):
        world = generate_synthetic_world(
            args.citizens, n_output_areas=args.oas, seed=seed
        )
        single = run_single(world, params, cfg, seed, seed0,
                            args.steps, args.chunk)

        if args.emulate:
            w2 = emulate_shard_routes(world, args.emulate)
            emul = run_single(w2, params, cfg, seed, seed0,
                              args.steps, args.chunk)
            d = delta_row(seed, single, emul, "single", "emulated")
            deltas.append(d)
            print(json.dumps(d), flush=True)
            continue

        from epidemicsimulator_tpu.parallel.fastmesh import run_fast_sharded
        from epidemicsimulator_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        _, _, outs = run_fast_sharded(
            world, params, cfg, mesh, seed=seed, starting_infected=seed0
        )
        shard = np.asarray(outs.seirv)
        d = delta_row(seed, single, shard, "single", "sharded")
        deltas.append(d)
        print(json.dumps(d), flush=True)

        if args.validate:
            w2 = emulate_shard_routes(world, 8)
            emul = run_single(w2, params, cfg, seed, seed0,
                              args.steps, args.chunk)
            d2 = delta_row(seed, single, emul, "single", "emulated")
            deltas_emul.append(d2)
            print(json.dumps({"validate": d2}), flush=True)

    meta = {
        "n_seeds": args.seeds, "n_citizens": args.citizens,
        "n_oas": args.oas, "steps": args.steps,
        "mode": f"emulate-{args.emulate}" if args.emulate else "mesh-8",
    }
    summary = summarize(deltas, meta)
    print(json.dumps(summary))
    if deltas_emul:
        print(json.dumps(summarize(
            deltas_emul, {"mode": "emulate-8 (validation arm)"})))
    if args.out:
        payload = {"rows": deltas, "summary": summary}
        if deltas_emul:
            payload["validation_rows"] = deltas_emul
            payload["validation_summary"] = summarize(deltas_emul)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
