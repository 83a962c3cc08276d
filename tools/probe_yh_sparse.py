"""Alternating one-process A/B of use_sparse_apply at Y&H scale.

Two regimes: the bench regime (lockdown from step 1, vax active — gates
never fire) and a moving regime (tiny seed, interventions off — work/bus
gates fire on schedule hours).  Arms alternate D,S,D,S to control drift.

Usage: python tools/probe_yh_sparse.py [--steps 1000] [--reps 2]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def time_arm(fn, params, mk_state, steps, chunk):
    import jax

    st, out = fn(params, mk_state())  # warmup (compile cached after first)
    jax.block_until_ready(out.seirv)
    st = mk_state()  # chunk runners donate the state buffers
    t0 = time.perf_counter()
    nst = 0
    while nst < steps:
        st, out = fn(params, st)
        nst += chunk
    jax.block_until_ready(out.seirv)
    dt = time.perf_counter() - t0
    return dt / nst * 1000, np.asarray(out.seirv)[-1].tolist()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)

    world = generate_synthetic_world(
        3_457_142, n_output_areas=15_669, seed=0
    ).device_put()
    params = Params.covid().as_arrays()
    base = Params.covid()
    off = Params(
        base.disease,
        dataclasses.replace(
            base.thresholds, lockdown=2.0, vaccination=2.0,
            mask_public_transport=2.0, mask_everywhere=2.0,
        ),
    ).as_arrays()

    for label, pr, seed_inf in (
        ("bench", params, 20_000),
        ("moving", off, 200),
    ):
        fns = {}
        for name, sparse in (("dense", False), ("sparse", True)):
            cfg = SimConfig(
                use_sparse_apply=sparse,
                max_steps=args.steps + args.chunk,
                chunk_size=args.chunk,
            )
            fns[name] = make_chunk_runner(world, cfg)
        mk_state = lambda si=seed_inf: init_state(
            world, seed=0, starting_infected=si
        )
        for rep in range(args.reps):
            for name in ("dense", "sparse"):
                ms, seirv = time_arm(fns[name], pr, mk_state, args.steps, args.chunk)
                print(f"[{label}/{name}/rep{rep}] {ms:.3f} ms/step "
                      f"seirv={seirv}", flush=True)


if __name__ == "__main__":
    main()
