"""Profile the 63M MOVING-regime step (the VERDICT-r2 #6 target window).

Pins the moving regime by disabling every intervention threshold and
seeding a sub-lockdown infected fraction, so every hour of the traced
chunk is a live moving hour (work sorts + run-totals + bus on schedule,
no lockdown freeze).  Captures an xplane trace of one chunk for
tools/xplane_summary.py, then times 4 chunks per arm.

Arms: --sparse (K-bounded apply, the 63M moving winner), --dense, or
both (default).  Trajectories are asserted bitwise-equal across arms.

Usage:
  python tools/probe_uk_moving.py                       # both arms + trace
  python tools/xplane_summary.py $(ls /tmp/uk_moving/**/*.xplane.pb) 40
"""

import dataclasses
import glob
import sys
import time

sys.path.insert(0, ".")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=63_000_000)
    ap.add_argument("--oas", type=int, default=227_759)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--seed-frac", type=float, default=0.001)
    ap.add_argument("--arm", choices=["sparse", "sorted", "dense", "both"],
                    default="both")
    ap.add_argument("--out", default="/tmp/uk_moving")
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
    from epidemicsimulator_tpu.config import InterventionThresholds
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    world = generate_synthetic_world_device(
        args.n, n_output_areas=args.oas, seed=0
    )
    jax.block_until_ready(world.age)
    print(f"world build: {time.perf_counter() - t0:.1f}s", flush=True)

    # moving regime, pinned: no intervention can ever fire
    params = Params(
        Params.covid().disease,
        InterventionThresholds(
            lockdown=-1.0, vaccination=-1.0,
            mask_public_transport=-1.0, mask_everywhere=-1.0,
        ),
    ).as_arrays()
    seed_inf = max(1, round(args.n * args.seed_frac))
    print(f"seeded {seed_inf} ({100 * args.seed_frac:.2f}%)", flush=True)

    # "sparse" = the sparse apply with the auto sortless work branch (the
    # new default at >=16M); "sorted" = sparse apply, sortless forced off
    # (the r2-era formulation); "dense" = the dense apply.
    arms = ["sparse", "sorted", "dense"] if args.arm == "both" else [args.arm]
    trajs = {}
    for arm in arms:
        cfg = SimConfig(
            max_steps=10**9, chunk_size=args.chunk,
            record_exposures_per_oa=False,
            use_sparse_apply=(arm != "dense"),
            use_sortless_work=(None if arm == "sparse" else False),
        )
        state = init_state(world, seed=0, starting_infected=seed_inf)
        chunk_fn = make_chunk_runner(world, cfg)

        t0 = time.perf_counter()
        state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)
        print(f"[{arm}] chunk1 (compile): {time.perf_counter() - t0:.1f}s",
              flush=True)
        state, out = chunk_fn(params, state)
        jax.block_until_ready(out.seirv)

        if arm == arms[0]:
            with jax.profiler.trace(args.out):
                state, out = chunk_fn(params, state)
                jax.block_until_ready(out.seirv)
        else:
            state, out = chunk_fn(params, state)
            jax.block_until_ready(out.seirv)

        t0 = time.perf_counter()
        seirvs = []
        for _ in range(4):
            state, out = chunk_fn(params, state)
            seirvs.append(out.seirv)
        jax.block_until_ready(out.seirv)
        ms = (time.perf_counter() - t0) / (4 * args.chunk) * 1e3
        print(f"[{arm}] {ms:.2f} ms/step  "
              f"(final census {np.asarray(out.seirv[-1]).tolist()})",
              flush=True)
        trajs[arm] = np.concatenate([np.asarray(s) for s in seirvs])

    ref_arm = arms[0]
    for arm in arms[1:]:
        same = bool((trajs[ref_arm] == trajs[arm]).all())
        print(f"bitwise {ref_arm}=={arm}: {same}", flush=True)
        assert same, f"{ref_arm} vs {arm} trajectories diverged"
    pbs = glob.glob(args.out + "/**/*.xplane.pb", recursive=True)
    print("traces:", pbs, flush=True)


if __name__ == "__main__":
    main()
