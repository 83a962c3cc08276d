"""Profile one Y&H bench-regime chunk (3.46M, 20k seeded, vax live) and
dump the xplane trace for tools/xplane_summary.py.

Usage:
  python tools/probe_yh_profile.py [--out /tmp/yh_prof] [--chunk 250]
  python tools/xplane_summary.py $(ls /tmp/yh_prof/**/*.xplane.pb) 40
"""

import glob
import sys
import time

sys.path.insert(0, ".")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--out", default="/tmp/yh_prof")
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
    t0 = time.perf_counter()
    world = generate_synthetic_world(
        3_457_142, n_output_areas=15_669, seed=0
    ).device_put()
    print(f"world: {time.perf_counter() - t0:.1f}s", flush=True)
    params = Params.covid().as_arrays()
    cfg = SimConfig(max_steps=args.chunk * 8, chunk_size=args.chunk)
    state = init_state(world, seed=0, starting_infected=20_000)
    fn = make_chunk_runner(world, cfg)

    state, out = fn(params, state)
    jax.block_until_ready(out.seirv)
    state, out = fn(params, state)
    jax.block_until_ready(out.seirv)

    with jax.profiler.trace(args.out):
        state, out = fn(params, state)
        jax.block_until_ready(out.seirv)

    t0 = time.perf_counter()
    for _ in range(4):
        state, out = fn(params, state)
    jax.block_until_ready(out.seirv)
    print(
        f"measured: {(time.perf_counter() - t0) / (4 * args.chunk) * 1e3:.2f}"
        " ms/step",
        flush=True,
    )
    print("traces:", glob.glob(args.out + "/**/*.xplane.pb", recursive=True),
          flush=True)


if __name__ == "__main__":
    main()
