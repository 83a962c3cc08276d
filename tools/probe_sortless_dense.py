"""A/B the dense apply's sortless work branch at Y&H bench scale.

One process, one attach: bench-shaped world (3.46M, 20k seeded so the
full intervention machinery fires in the window, exactly bench.py's
regime), arms = dense-sorted (use_sortless_dense=False) vs dense-sortless
(True), 1000 timed steps each after a 250-step warmup.  Trajectories are
asserted bitwise-equal (same final census every chunk).

Usage: python tools/probe_sortless_dense.py [--chunks 4] [--chunk 250]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--citizens", type=int, default=3_457_142)
    ap.add_argument("--oas", type=int, default=15_669)
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
    world = generate_synthetic_world(
        args.citizens, n_output_areas=args.oas, seed=0
    )
    wd = world.device_put()
    params = Params.covid().as_arrays()

    trajs = {}
    for arm in ("sorted", "sortless"):
        cfg = SimConfig(max_steps=10**9, chunk_size=args.chunk,
                        use_sortless_dense=(arm == "sortless"))
        st = init_state(wd, seed=0, starting_infected=20_000)
        fn = make_chunk_runner(wd, cfg)
        t0 = time.perf_counter()
        st, out = fn(params, st)
        jax.block_until_ready(out.seirv)
        print(f"[{arm}] compile+warmup: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        rows = []
        for _ in range(args.chunks):
            st, out = fn(params, st)
            rows.append(out.seirv)
        jax.block_until_ready(out.seirv)
        ms = (time.perf_counter() - t0) / (args.chunks * args.chunk) * 1e3
        print(f"[{arm}] {ms:.2f} ms/step "
              f"({args.citizens / ms * 1e3 / 1e6:.0f}M c-s/s)  "
              f"final {np.asarray(out.seirv)[-1].tolist()}", flush=True)
        trajs[arm] = np.concatenate([np.asarray(r) for r in rows])
    same = bool((trajs["sorted"] == trajs["sortless"]).all())
    print(f"bitwise sorted==sortless: {same}", flush=True)
    assert same


if __name__ == "__main__":
    main()
