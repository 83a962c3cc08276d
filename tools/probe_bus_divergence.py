"""Quantify the ONE sharded-vs-single divergence: bus assembly.

Since every citizen-keyed draw is hashed on (step seed, global id), the
sharded fast path reproduces single-device trajectories bitwise except for
bus composition (buses assemble per home shard; the reference-semantics
shuffle+chunk is shard-local, parallel/fastmesh.py).  Any SEIRV delta
measured here is therefore PURELY the bus shard-boundary term.

Runs on the virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/probe_bus_divergence.py [n_seeds] [n_citizens]

Prints per-seed single vs sharded (peak, peak_h, attack) and the summary
deltas for docs/FIDELITY.md.
"""

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
from epidemicsimulator_tpu.parallel.fastmesh import run_fast_sharded  # noqa: E402
from epidemicsimulator_tpu.parallel.mesh import make_mesh  # noqa: E402


def curve_stats(seirv):
    inf = seirv[:, 2]
    return {
        "peak": int(inf.max()),
        "peak_h": int(inf.argmax()),
        "attack": int(seirv[-1, 1:4].sum()),
    }


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000
    steps, chunk = 400, 100
    base = Params.covid()
    # aggressive enough that the epidemic runs its course in `steps`, with
    # buses live throughout (20% transport usage in the synthetic world)
    params = Params(
        dataclasses.replace(base.disease, exposure_chance=0.02,
                            vaccination_rate=50),
        dataclasses.replace(base.thresholds, lockdown=0.30, vaccination=0.10,
                            mask_public_transport=0.02, mask_everywhere=0.15),
    )
    mesh = make_mesh(8)
    deltas = []
    for seed in range(n_seeds):
        world = generate_synthetic_world(n, n_output_areas=24, seed=seed)
        cfg = SimConfig(max_steps=steps, chunk_size=chunk)
        st = init_state(world, seed=seed, starting_infected=40)
        runner = make_chunk_runner(world.device_put(), cfg)
        p = params.as_arrays()
        rows = []
        for _ in range(steps // chunk):
            st, out = runner(p, st)
            rows.append(np.asarray(out.seirv))
        single = np.concatenate(rows)

        _, _, outs = run_fast_sharded(
            world, params, cfg, mesh, seed=seed, starting_infected=40
        )
        shard = np.asarray(outs.seirv)
        t = min(len(single), len(shard))
        s1, s2 = curve_stats(single[:t]), curve_stats(shard[:t])
        d = {
            "seed": seed,
            "single": s1,
            "sharded": s2,
            "peak_delta_pct": round(100 * (s2["peak"] - s1["peak"]) / max(s1["peak"], 1), 3),
            "attack_delta_pct": round(100 * (s2["attack"] - s1["attack"]) / max(s1["attack"], 1), 3),
            "max_step_seirv_linf": int(np.abs(single[:t] - shard[:t]).max()),
        }
        deltas.append(d)
        print(json.dumps(d), flush=True)

    pk = [abs(d["peak_delta_pct"]) for d in deltas]
    at = [abs(d["attack_delta_pct"]) for d in deltas]
    print(json.dumps({
        "n_seeds": n_seeds, "n_citizens": n,
        "abs_peak_delta_pct": {"mean": round(float(np.mean(pk)), 3),
                               "max": round(float(np.max(pk)), 3)},
        "abs_attack_delta_pct": {"mean": round(float(np.mean(at)), 3),
                                 "max": round(float(np.max(at)), 3)},
    }))


if __name__ == "__main__":
    main()
