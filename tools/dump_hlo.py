"""Dump the optimized HLO of the Y&H bench chunk program for inspection.

Writes /tmp/bench_chunk_hlo.txt (optimized, post-layout).  Used to chase
the vaccinate-cond-firing cost (tools/probe_vax_parts*.py).

Usage: python tools/dump_hlo.py [--parts N] [--no-rep]
"""

import sys
import time

sys.path.insert(0, ".")


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
    from epidemicsimulator_tpu.engine.step import step

    parts = -1
    rep = None
    for i, a in enumerate(sys.argv):
        if a == "--parts":
            parts = int(sys.argv[i + 1])
        if a == "--no-rep":
            rep = False

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)
    world = generate_synthetic_world_device(
        3_457_142, n_output_areas=15_669, seed=0
    )
    jax.block_until_ready(world.age)

    kw = dict(max_steps=1500, chunk_size=250, debug_vax_parts=parts)
    if rep is not None:
        kw["use_replicated_orders"] = rep
    cfg = SimConfig(**kw)
    params = Params.covid().as_arrays()
    st = init_state(world, seed=0, starting_infected=20_000)

    def chunk(world, params, state):
        def body(carry, _):
            return step(world, params, cfg, carry)

        return jax.lax.scan(body, state, None, length=cfg.chunk_size)

    lowered = jax.jit(chunk).lower(world, params, st)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    txt = compiled.as_text()
    out = f"/tmp/bench_chunk_hlo_parts{parts}_rep{rep}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} chars)", flush=True)


if __name__ == "__main__":
    main()
