"""A/B the unconditional vaccinate formulation (debug_vax_parts=-2).

probe_vax_parts2 proved the vaccinate lax.cond costs ~55 ms per FIRING
even with a trivial branch body (59.6 fired vs 5.0 unfired ms/step within
one executable).  This measures the fix candidate: run the full vaccinate
branch unconditionally (pre-activation eligible is all-false -> k=0 ->
no-op), removing the cond entirely.

  A. default cond,   covid params (vax fires mid-run)   ~57 ms/step
  B. unconditional,  covid params  -> must match A's seirv bitwise
  C. default cond,   vax threshold -1 (never fires)      ~5 ms/step
  D. unconditional,  vax threshold -1 -> overhead vs C; seirv == C

Usage: python tools/probe_vax_uncond.py
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
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
        3_457_142, n_output_areas=15_669, seed=0
    )
    jax.block_until_ready(world.age)
    print(f"world: {time.perf_counter() - t0:.1f}s", flush=True)

    base = Params.covid()
    p_on = base.as_arrays()
    p_off = dataclasses.replace(
        base,
        thresholds=dataclasses.replace(base.thresholds, vaccination=-1.0),
    ).as_arrays()

    cfg_cond = SimConfig(max_steps=1500, chunk_size=250)
    cfg_unc = SimConfig(max_steps=1500, chunk_size=250, debug_vax_parts=-2)
    variants = [
        ("A cond fired", cfg_cond, p_on),
        ("B uncond fired", cfg_unc, p_on),
        ("C cond unfired", cfg_cond, p_off),
        ("D uncond unfired", cfg_unc, p_off),
    ]
    for name, cfg, params in variants:
        st = init_state(world, seed=0, starting_infected=20_000)
        fn = make_chunk_runner(world, cfg)
        t0 = time.perf_counter()
        st, out = fn(params, st)
        jax.block_until_ready(out.seirv)
        print(f"[{name}] compile+warmup: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(4):
            st, out = fn(params, st)
        jax.block_until_ready(out.seirv)
        dt = time.perf_counter() - t0
        print(
            f"[{name}] 1000 steps: {dt:.2f}s ({dt:.3f} ms/step) "
            f"seirv={np.asarray(out.seirv)[-1].tolist()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
