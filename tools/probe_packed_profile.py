"""Profile one packed-ensemble chunk (64 x 208k replicas, engine/packed.py)
and dump the xplane trace for tools/xplane_summary.py.

Usage:
  python tools/probe_packed_profile.py [--out /tmp/packed_prof] [--chunk 250]
  python tools/xplane_summary.py $(ls /tmp/packed_prof/**/*.xplane.pb) 40
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--replicates", type=int, default=64)
    ap.add_argument("--citizens", type=int, default=208_000)
    ap.add_argument("--out", default="/tmp/packed_prof")
    ap.add_argument("--block-rows", type=int, default=128)
    ap.add_argument("--no-vax", action="store_true",
                    help="disable the vaccination program (isolates the "
                         "fired-cond stall)")
    ap.add_argument("--no-lockdown", action="store_true")
    args = ap.parse_args()
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

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
    import dataclasses

    import numpy as np

    bp = Params.covid()
    th0 = bp.thresholds
    if args.no_vax:
        th0 = dataclasses.replace(th0, vaccination=-1.0)
    if args.no_lockdown:
        th0 = dataclasses.replace(th0, lockdown=-1.0)
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
            th0,
        )
        for _ in range(args.replicates)
    ]
    t0 = time.perf_counter()
    pe = pack_replicas(base, param_list, block_rows=args.block_rows)
    print(f"pack: {time.perf_counter() - t0:.1f}s "
          f"({pe.world.n_citizens:,} packed citizens)", flush=True)
    th = param_list[0].as_arrays().thresholds
    cfg = SimConfig(max_steps=args.chunk * 8, chunk_size=args.chunk)
    state = init_packed_state(pe, seed=0, starting_infected=10)
    fn = make_packed_runner(pe, cfg)

    t0 = time.perf_counter()
    state, out = fn(th, state)
    jax.block_until_ready(out)
    print(f"compile+first chunk: {time.perf_counter() - t0:.1f}s", flush=True)
    state, out = fn(th, state)
    jax.block_until_ready(out)

    with jax.profiler.trace(args.out):
        state, out = fn(th, state)
        jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(4):
        state, out = fn(th, state)
    jax.block_until_ready(out)
    print(
        f"measured: {(time.perf_counter() - t0) / (4 * args.chunk) * 1e3:.2f}"
        " ms/step",
        flush=True,
    )


if __name__ == "__main__":
    main()
