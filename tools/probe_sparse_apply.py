"""One-process A/B: sparse apply (K-bounded scatter drain of gated
work/bus hits) vs the dense N-wide select apply, same fused packed
kernel.  Two regimes:

* Y&H bench shape (3.46M, vax active via bench's starting infections)
* 63M lean (no per-OA recording, vaccination thresholds off)

Usage: python tools/probe_sparse_apply.py [--yh] [--uk] [--uk-n N]
(default: both arms)
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def run_arms(world, params, cfg_base, steps, chunk, infected, label):
    import jax

    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    for name, sparse in (("dense", False), ("sparse", True)):
        cfg = dataclasses.replace(
            cfg_base, use_sparse_apply=sparse,
            max_steps=steps + chunk, chunk_size=chunk,
        )
        st = init_state(world, seed=0, starting_infected=infected)
        fn = make_chunk_runner(world, cfg)
        t0 = time.perf_counter()
        st, out = fn(params, st)
        jax.block_until_ready(out.seirv)
        print(f"[{label}/{name}] compile+warmup: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        nst = 0
        while nst < steps:
            st, out = fn(params, st)
            nst += chunk
        jax.block_until_ready(out.seirv)
        dt = time.perf_counter() - t0
        print(f"[{label}/{name}] {nst} steps: {dt:.2f}s "
              f"({dt / nst * 1000:.3f} ms/step) "
              f"seirv={np.asarray(out.seirv)[-1].tolist()}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--yh", action="store_true")
    ap.add_argument("--uk", action="store_true")
    ap.add_argument("--uk-n", type=int, default=63_000_000)
    args = ap.parse_args()
    if not (args.yh or args.uk):
        args.yh = args.uk = True

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)
    params = Params.covid().as_arrays()

    if args.yh:
        t0 = time.perf_counter()
        world = generate_synthetic_world(
            3_457_142, n_output_areas=15_669, seed=0
        ).device_put()
        print(f"yh world: {time.perf_counter() - t0:.1f}s", flush=True)
        run_arms(world, params, SimConfig(), 1000, 250, 20_000, "yh")
        del world

    if args.uk:
        t0 = time.perf_counter()
        from epidemicsimulator_tpu import generate_synthetic_world_device

        world = generate_synthetic_world_device(
            args.uk_n, n_output_areas=227_759, seed=0
        )
        jax.block_until_ready(world.age)
        print(f"uk world: {time.perf_counter() - t0:.1f}s", flush=True)
        base = Params.covid()
        lean = Params(
            base.disease,
            dataclasses.replace(base.thresholds, vaccination=2.0),
        ).as_arrays()
        cfg = SimConfig(record_exposures_per_oa=False)
        seed_inf = max(1, round(args.uk_n * 20_000 / 3_457_142))
        run_arms(world, lean, cfg, 600, 200, seed_inf, "uk-lean")
        run_arms(world, params, SimConfig(), 600, 200, seed_inf, "uk-full")


if __name__ == "__main__":
    main()
