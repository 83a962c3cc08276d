"""Sharded fast path on a 1-device mesh vs the single-device fast path.

The one measurable single-chip proxy for multi-chip scaling.  The r2-era
"within ~15%" expectation assumed the residual was plumbing; the measured
decomposition (--gates arms; sample_results/fastmesh_1dev, docs/PERF.md
"Sharded 1-dev decomposition") shows ~1.1 ms/step of it is the sharded
formulation itself (collectives, slot machinery, ghost exchanges), which
amortises on real multi-chip meshes.  Current floor: 5.54 ms/step on the
1-dev mesh vs the 2.2-2.9 fastpath window.

Usage: python tools/probe_fastmesh_1dev.py [--citizens 3457142] [--chunk 250]
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--citizens", type=int, default=3_457_142)
    ap.add_argument("--oas", type=int, default=15_669)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--infected", type=int, default=100,
                    help="starting infected (raise past every threshold "
                    "for vaccination-live A/B windows, e.g. ab-vax)")
    ap.add_argument("--skip-single", action="store_true")
    ap.add_argument("--profile", default=None,
                    help="dump an xplane trace of one sharded chunk here "
                    "(NOTE: jax.profiler.trace around the shard_map "
                    "executable crashes this tunnel's TPU backend — "
                    "reproducible INVALID_ARGUMENT; use --gates for "
                    "subtractive decomposition instead)")
    ap.add_argument("--gates", default="on",
                    help="comma list of gate arms (on|bus-off|work-off|"
                    "both-off) forced in BOTH engines — semantics-changing; "
                    "for step-budget subtraction.  All arms share one "
                    "process (one tunnel attach).")
    args = ap.parse_args()
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)

    world = generate_synthetic_world(
        args.citizens, n_output_areas=args.oas, seed=0
    )
    params = Params.covid()
    GATE_MAP = {
        "on": None,
        "bus-off": (None, False),
        "work-off": (False, None),
        "both-off": (False, False),
    }
    arms = [a.strip() for a in args.gates.split(",")]

    def timed(label, fn, state, *rest):
        t0 = time.perf_counter()
        state, out = fn(*rest, state)
        jax.block_until_ready(jax.tree.leaves(out))
        print(f"{label}: compile+first chunk {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(args.chunks):
            state, out = fn(*rest, state)
        jax.block_until_ready(jax.tree.leaves(out))
        ms = (time.perf_counter() - t0) / (args.chunks * args.chunk) * 1e3
        print(
            f"{label}: {ms:.2f} ms/step "
            f"({args.citizens / ms * 1e3 / 1e6:.0f}M c-s/s)",
            flush=True,
        )
        return ms

    # --- sharded path, 1-device mesh ---
    from jax.sharding import NamedSharding, PartitionSpec as P

    from epidemicsimulator_tpu.parallel.fastmesh import (
        init_sharded_state, make_fast_sharded_runner,
    )
    from epidemicsimulator_tpu.parallel.mesh import make_mesh
    from epidemicsimulator_tpu.parallel.partition import partition_world

    mesh = make_mesh(1)
    t0 = time.perf_counter()
    sw = partition_world(world, 1)
    print(f"partition: {time.perf_counter() - t0:.1f}s", flush=True)
    w_sh = jax.tree.map(
        lambda x: jax.device_put(jax.numpy.asarray(x),
                                 NamedSharding(mesh, P("pop")))
        if hasattr(x, "shape") else x,
        sw,
    )
    p = params.as_arrays()
    if not args.skip_single:
        from epidemicsimulator_tpu.engine.scan import make_chunk_runner
        from epidemicsimulator_tpu.engine.state import init_state

        wd = world.device_put()

    for arm in arms:
        ab_arms = [(None, None)]
        if arm == "parts":
            # the per-collective cost table ladder (docs/PERF.md): both
            # gated sides forced OFF, then subtract base-budget terms one
            # bit at a time (SimConfig.debug_shard_parts) — every rung is
            # value-identical on the 1-dev mesh in this regime
            ab_arms = [("debug_shard_parts", v) for v in (-1, 1, 3, 7)]
            arm = "both-off"
        elif arm == "ab-sortless":
            ab_arms = [("use_sortless_sharded", False),
                       ("use_sortless_sharded", True)]
        elif arm == "ab-vax":
            # one-process A/B of the sharded exact-k vaccination selector
            # (32-round psum bisection vs sampled band); run with
            # --infected high enough that vaccination fires from step 1
            ab_arms = [("use_sampled_vax_sharded", False),
                       ("use_sampled_vax_sharded", True)]
        for field, val in ab_arms:
            cfg = SimConfig(
                max_steps=10**9, chunk_size=args.chunk,
                debug_force_gates=GATE_MAP.get(arm),
                **({field: val} if field else {}),
            )
            st = init_sharded_state(
                world, sw, seed=0, starting_infected=args.infected, cfg=cfg
            )
            runner = make_fast_sharded_runner(sw, cfg, mesh)
            label = arm if field is None else f"{field}={val}"
            ms_sh = timed(f"sharded-1dev[{label}]",
                          lambda pp, s: runner(w_sh, pp, s), st, p)
        if args.profile:
            import glob

            with jax.profiler.trace(args.profile):
                st, out = runner(w_sh, p, st)
                jax.block_until_ready(jax.tree.leaves(out))
            print("traces:",
                  glob.glob(args.profile + "/**/*.xplane.pb",
                            recursive=True),
                  flush=True)

        if not args.skip_single:
            st1 = init_state(world, seed=0, starting_infected=args.infected)
            fn1 = make_chunk_runner(wd, cfg)
            ms_1 = timed(f"fastpath[{arm}]", fn1, st1, p)
            print(f"[{arm}] ratio sharded/fastpath: {ms_sh / ms_1:.2f} "
                  f"(delta {ms_sh - ms_1:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
