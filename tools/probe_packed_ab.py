"""Packed-ensemble timing A/B in ONE process: default thresholds vs
vaccination-disabled vs all-interventions-disabled.  Thresholds are traced,
so all three share one executable — this isolates the cost of the FIRING
vaccinate/work conds without recompiles or re-packing.

Usage: python tools/probe_packed_ab.py [--chunk 250] [--chunks 4]
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--replicates", type=int, default=64)
    ap.add_argument("--citizens", type=int, default=208_000)
    args = ap.parse_args()
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.engine.packed import (
        init_packed_state, make_packed_runner, pack_replicas,
    )

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)
    base = generate_synthetic_world(
        args.citizens, n_output_areas=args.citizens // 320, seed=0
    )
    bp = Params.covid()
    rng = np.random.default_rng(0)
    param_list = [
        Params(
            dataclasses.replace(
                bp.disease,
                exposure_chance=float(
                    bp.disease.exposure_chance * rng.uniform(0.5, 1.5)
                ),
                exposed_time=int(rng.integers(24, 120)),
                infected_time=int(rng.integers(96, 336)),
            ),
            bp.thresholds,
        )
        for _ in range(args.replicates)
    ]
    t0 = time.perf_counter()
    pe = pack_replicas(base, param_list)
    print(f"pack: {time.perf_counter() - t0:.1f}s "
          f"({pe.world.n_citizens:,} packed citizens)", flush=True)
    cfg = SimConfig(max_steps=10**9, chunk_size=args.chunk)
    fn = make_packed_runner(pe, cfg)

    th0 = param_list[0].as_arrays().thresholds
    variants = {
        "default": th0,
        "no_vax": dataclasses.replace(
            th0, vaccination=__import__("jax").numpy.float32(-1.0)
        ),
        "no_interventions": dataclasses.replace(
            th0,
            vaccination=__import__("jax").numpy.float32(-1.0),
            lockdown=__import__("jax").numpy.float32(-1.0),
            mask_public_transport=__import__("jax").numpy.float32(-1.0),
            mask_everywhere=__import__("jax").numpy.float32(-1.0),
        ),
    }
    first = True
    for name, th in variants.items():
        state = init_packed_state(pe, seed=0, starting_infected=10)
        t0 = time.perf_counter()
        state, out = fn(th, state)
        jax.block_until_ready(out)
        label = "compile+warmup" if first else "warmup"
        print(f"{name}: {label} chunk {time.perf_counter() - t0:.1f}s",
              flush=True)
        first = False
        t0 = time.perf_counter()
        for _ in range(args.chunks):
            state, out = fn(th, state)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        seirv = np.asarray(out)[-1]
        agg = pe.n_replicas * pe.rep_size
        ms = dt / (args.chunks * args.chunk) * 1e3
        print(
            f"{name}: {ms:.2f} ms/step "
            f"({agg / ms * 1e3 / 1e6:.0f}M c-s/s aggregate); "
            f"V={int(seirv[:, 4].sum())} I={int(seirv[:, 2].sum())}",
            flush=True,
        )


if __name__ == "__main__":
    main()
