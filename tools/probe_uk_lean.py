"""Minimal 63M lean-regime step timing (dense apply path), version-portable:
uses only API surface that exists at and after commit 7bae2c5.  For
bisecting the 63M regression observed 2026-08-18 (6.5 -> 112 ms/step).

Usage: python tools/probe_uk_lean.py [--n N] [--steps S] [--chunk C]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=63_000_000)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--chunk", type=int, default=200)
    ap.add_argument("--sparse", action="store_true",
                    help="force use_sparse_apply=True (newer trees only)")
    ap.add_argument("--dense", action="store_true",
                    help="force use_sparse_apply=False (newer trees only)")
    args = ap.parse_args()

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from epidemicsimulator_tpu import (
        Params,
        SimConfig,
        generate_synthetic_world_device,
    )
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    t0 = time.perf_counter()
    world = generate_synthetic_world_device(
        args.n, n_output_areas=227_759, seed=0
    )
    jax.block_until_ready(world.age)
    print(f"world: {time.perf_counter() - t0:.1f}s", flush=True)

    base = Params.covid()
    lean = Params(
        base.disease,
        dataclasses.replace(base.thresholds, vaccination=2.0),
    ).as_arrays()
    cfg = SimConfig(
        record_exposures_per_oa=False,
        max_steps=args.steps + args.chunk,
        chunk_size=args.chunk,
    )
    if args.sparse:
        cfg = dataclasses.replace(cfg, use_sparse_apply=True)
    if args.dense:
        cfg = dataclasses.replace(cfg, use_sparse_apply=False)
    seed_inf = max(1, round(args.n * 20_000 / 3_457_142))
    st = init_state(world, seed=0, starting_infected=seed_inf)
    fn = make_chunk_runner(world, cfg)
    t0 = time.perf_counter()
    st, out = fn(lean, st)
    jax.block_until_ready(out.seirv)
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    nst = 0
    while nst < args.steps:
        st, out = fn(lean, st)
        nst += args.chunk
    jax.block_until_ready(out.seirv)
    dt = time.perf_counter() - t0
    print(
        f"[uk-lean] {nst} steps: {dt:.2f}s ({dt / nst * 1000:.3f} ms/step) "
        f"seirv={np.asarray(out.seirv)[-1].tolist()}",
        flush=True,
    )


if __name__ == "__main__":
    main()
