"""A/B: packed 64x208k ensemble vs ONE 13.3M world, matched regime.

The packed engine's per-lane cost should match a single world of the same
total lane count in the same (moving, no-lockdown) regime — the ensemble's
tiny per-replica epidemics never trigger lockdown, so the work side runs
every day-hour step, unlike the headline Y&H bench window (lockdown live,
work side gated off).  This probe pins the overhead of packing itself.

Usage: python tools/probe_packed_vs_single.py [--chunk 250]
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
    args = ap.parse_args()
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)

    # single world, same total lanes as 64 x 208k, no lockdown (moving
    # regime throughout, like the ensemble's sub-threshold epidemics)
    N = 13_312_000
    world = generate_synthetic_world(N, n_output_areas=N // 320, seed=0)
    world = world.device_put()
    base = Params.covid()
    p = Params(
        base.disease,
        dataclasses.replace(
            base.thresholds, lockdown=-1.0, vaccination=-1.0
        ),
    ).as_arrays()
    cfg = SimConfig(max_steps=args.chunk * 8, chunk_size=args.chunk)
    state = init_state(world, seed=0, starting_infected=640)
    fn = make_chunk_runner(world, cfg)

    t0 = time.perf_counter()
    state, out = fn(p, state)
    jax.block_until_ready(out.seirv)
    print(f"compile+first chunk: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.chunks):
        state, out = fn(p, state)
    jax.block_until_ready(out.seirv)
    dt = time.perf_counter() - t0
    seirv = np.asarray(out.seirv)[-1]
    print(
        f"single 13.3M moving regime: "
        f"{dt / (args.chunks * args.chunk) * 1e3:.2f} ms/step "
        f"(seirv {seirv.tolist()})",
        flush=True,
    )


if __name__ == "__main__":
    main()
