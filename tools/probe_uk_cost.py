"""XLA cost analysis of the 63M lean chunk: where do 8.8 ms/step go?

Compiles the lean (no per-OA recording, vaccination never triggered)
63M chunk, prints compiled.cost_analysis() totals, and dumps the
optimized HLO to /tmp/uk_lean_hlo.txt.  A rough roofline: bytes-accessed
/ 819 GB/s (v5e HBM) is the bandwidth-bound floor; the gap to the
measured 8.8 ms/step is scheduling/fusion overhead to hunt in the HLO.

Usage: python tools/probe_uk_cost.py [--chunk 24]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=63_000_000)
    ap.add_argument("--oas", type=int, default=227_759)
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--block-rows", type=int, default=None,
                    help="override SimConfig.fused_block_rows")
    args = ap.parse_args()

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax

    from epidemicsimulator_tpu import (
        Params,
        SimConfig,
        generate_synthetic_world_device,
    )
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

    novax = Params.covid()
    params = Params(
        novax.disease,
        dataclasses.replace(novax.thresholds, vaccination=2.0),
    ).as_arrays()

    extra = {}
    if args.block_rows:
        extra["fused_block_rows"] = args.block_rows
    cfg = SimConfig(
        max_steps=args.chunk * 6, chunk_size=args.chunk,
        record_exposures_per_oa=False, **extra,
    )
    seed_inf = max(1, round(args.n * 20_000 / 3_457_142))
    state = init_state(world, seed=0, starting_infected=seed_inf)
    chunk_fn = make_chunk_runner(world, cfg)

    # Reach the memoised jitted callable to lower/compile explicitly.
    from epidemicsimulator_tpu.engine.scan import _RUNNER_CACHE, world_signature

    jitted = _RUNNER_CACHE[(cfg, world_signature(world))]
    t0 = time.perf_counter()
    lowered = jitted.lower(world, params, state)
    print(f"lower: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)

    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        per_step = lambda v: v / args.chunk
        keys = sorted(ca, key=lambda k: -abs(ca[k]) if isinstance(ca[k], (int, float)) else 0)
        for k in keys[:20]:
            v = ca[k]
            if isinstance(v, (int, float)) and v:
                print(f"  {k}: {v:.3e}  (/step {per_step(v):.3e})", flush=True)
        if "bytes accessed" in ca:
            floor_ms = ca["bytes accessed"] / args.chunk / 819e9 * 1e3
            print(f"bandwidth floor: {floor_ms:.2f} ms/step @819GB/s", flush=True)
    except Exception as e:
        print(f"cost_analysis unavailable: {e!r}", flush=True)

    try:
        txt = compiled.as_text()
        with open("/tmp/uk_lean_hlo.txt", "w") as f:
            f.write(txt)
        print(f"dumped optimized HLO: {len(txt) / 1e6:.1f} MB", flush=True)
    except Exception as e:
        print(f"as_text unavailable: {e!r}", flush=True)

    # Quick timing cross-check in the same process.
    import numpy as np

    st, out = chunk_fn(params, state)
    jax.block_until_ready(out.seirv)
    t0 = time.perf_counter()
    for _ in range(4):
        st, out = chunk_fn(params, st)
    jax.block_until_ready(out.seirv)
    dt = time.perf_counter() - t0
    print(f"measured: {dt / (4 * args.chunk) * 1e3:.2f} ms/step "
          f"seirv={np.asarray(out.seirv)[-1].tolist()}", flush=True)


if __name__ == "__main__":
    main()
