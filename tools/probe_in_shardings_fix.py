"""Does explicit in_shardings fix the device-built-world vax stall?

probe_world_provenance.py showed: same values+shapes, chunk runner compiled
against device-native (committed=True) world buffers runs the vax-active
regime at ~70 ms/step, while compiled against host-put (committed=False)
buffers it runs 3.91 ms/step.  Hypothesis: jit specializes on commitment and
the committed-input program pins branch scalars to host memory (S(6) in the
HLO dump).  Explicit in_shardings should normalise both provenances to one
(good) program.

Arm C: device-native world + jit(chunk, in_shardings=SingleDeviceSharding).
Expect ~3.9 ms/step if the fix works, ~70 if not.

Usage: python tools/probe_in_shardings_fix.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from epidemicsimulator_tpu import (
        Params,
        SimConfig,
        generate_synthetic_world_device,
    )
    from epidemicsimulator_tpu.engine.state import init_state
    from epidemicsimulator_tpu.engine.step import step

    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    world = generate_synthetic_world_device(3_457_142, n_output_areas=15_669, seed=0)
    jax.block_until_ready(world.age)
    print(f"world: {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = SimConfig(max_steps=1500, chunk_size=250)
    params = Params.covid().as_arrays()

    # Rebuild the same chunk fn as engine.scan but with explicit in_shardings.
    from epidemicsimulator_tpu.engine.fastpath import (
        make_rider_statics,
        wants_fused_citizen,
        wants_replicated,
    )

    st = init_state(world, seed=0, starting_infected=20_000)

    fused_statics = make_citizen_statics = None
    if wants_fused_citizen(world, cfg):
        from epidemicsimulator_tpu.ops.pallas_citizen import make_citizen_statics

        fused_statics = make_citizen_statics(world)
    rider_statics = None
    if wants_replicated(world, cfg, st):
        rider_statics = make_rider_statics(world)

    def chunk(world, params, state):
        def body(carry, _):
            new_state, out = step(
                world, params, cfg, carry,
                fused_statics=fused_statics,
                rider_statics=rider_statics,
            )
            return new_state, out

        state, outs = jax.lax.scan(body, state, None, length=cfg.chunk_size)
        outs = outs._replace(
            exposures_per_oa=jnp.minimum(outs.exposures_per_oa, 32767).astype(
                jnp.int16
            )
        )
        return state, outs

    dev = jax.devices()[0]
    s = jax.sharding.SingleDeviceSharding(dev)
    jitted = jax.jit(chunk, donate_argnums=(2,), in_shardings=(s, s, s))

    t0 = time.perf_counter()
    st, out = jitted(world, params, st)
    jax.block_until_ready(out.seirv)
    print(f"[C in_shardings] compile+warmup: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(4):
        st, out = jitted(world, params, st)
    jax.block_until_ready(out.seirv)
    dt = time.perf_counter() - t0
    print(
        f"[C in_shardings] 1000 steps: {dt:.2f}s ({dt:.3f} ms/step) "
        f"seirv={np.asarray(out.seirv)[-1].tolist()}",
        flush=True,
    )


if __name__ == "__main__":
    main()
