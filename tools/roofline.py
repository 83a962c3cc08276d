"""HBM roofline accounting for the final engine — VERDICT r4 #6.

PERF.md's xplane decompositions justify the single-chip "measured floor"
claims operationally (every named lever tried); this tool supplies the
missing bound: bytes-touched/step against the chip's HBM bandwidth.

Method: XLA's own `compiled.cost_analysis()["bytes accessed"]` on TWO
executables per regime —

* the full bench-regime program (counts BOTH sides of every lax.cond,
  so it upper-bounds any executed step);
* the same program with `SimConfig.debug_force_gates=(False, False)`
  (work/bus sides forced off => XLA dead-code-eliminates the heavy
  branches), which counts only the unconditional per-step traffic —
  a lower bound on what every step must move.

Both arms are timed in the same process (probe protocol), so each gets
its own roofline fraction: bytes / (ms/step x HBM_BW).  The executed
truth of a mixed regime sits between the brackets.

TPU v5e (this tunnel's "TPU v5 lite"): 819 GB/s HBM.  The MXU is idle
in this workload (no matmuls — exposure is elementwise + segment scans),
so HBM bandwidth IS the roofline; compute ceilings are not binding.

Writes sample_results/roofline/summary.json.

Usage:
  python tools/roofline.py --regime yh          # 3.46M bench regime
  python tools/roofline.py --regime uk          # 63M moving regime
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "sample_results/roofline"
HBM_BYTES_PER_S = 819e9  # TPU v5e public spec


def _bytes_accessed(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax: one dict per computation
        ca = ca[0]
    return float(ca["bytes accessed"])


def _measure(chunk_fn, params, state, chunks, chunk_size):
    import numpy as np

    # np.asarray — NOT block_until_ready, which does not block through
    # the axon tunnel: un-drained warm chunks then stack under the timed
    # dispatches over donated buffers and inflate ms/step ~10x
    # (measured; the .claude/skills/verify gotcha).
    state, out = chunk_fn(params, state)  # compile + warm
    np.asarray(out.seirv)
    state, out = chunk_fn(params, state)
    np.asarray(out.seirv)
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, out = chunk_fn(params, state)
    final = np.asarray(out.seirv)
    ms = (time.perf_counter() - t0) / (chunks * chunk_size) * 1e3
    return ms, final[-1].tolist()


def run_regime(regime):
    import dataclasses

    import jax

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.config import InterventionThresholds
    from epidemicsimulator_tpu.engine import scan as scan_mod
    from epidemicsimulator_tpu.engine.scan import (
        make_chunk_runner, world_signature,
    )
    from epidemicsimulator_tpu.engine.state import init_state

    if regime == "yh":
        n, oas, chunk, chunks = 3_457_142, 15_669, 250, 3
        seed_inf = 20_000  # the bench.py mixed regime
        params = Params.covid().as_arrays()
    else:
        n, oas, chunk, chunks = 63_000_000, 227_759, 100, 3
        seed_inf = max(1, round(n * 0.001))  # probe_uk_moving protocol
        params = Params(
            Params.covid().disease,
            InterventionThresholds(
                lockdown=-1.0, vaccination=-1.0,
                mask_public_transport=-1.0, mask_everywhere=-1.0,
            ),
        ).as_arrays()

    t0 = time.perf_counter()
    world = generate_synthetic_world(n, n_output_areas=oas, seed=0)
    print(f"world {time.perf_counter() - t0:.1f}s", flush=True)
    wd = world.device_put()

    res = {"n_citizens": n, "chunk_size": chunk}
    # forced arms pin every lax.cond so XLA DCEs the untaken side and the
    # AOT byte count matches what a step of that regime EXECUTES; the
    # "full" arm's byte count includes BOTH sides of every cond (an upper
    # bound on any step, not an executed figure) while its timing is the
    # real mixed bench regime.
    for arm, force in (
        ("full", None),
        ("gates_on", (True, True)),
        ("gates_off", (False, False)),
    ):
        cfg = SimConfig(
            max_steps=10**9, chunk_size=chunk,
            record_exposures_per_oa=(regime == "yh"),
            debug_force_gates=force,
        )
        state = init_state(world, seed=0, starting_infected=seed_inf)
        chunk_fn = make_chunk_runner(wd, cfg)
        ms, census = _measure(chunk_fn, params, state, chunks, chunk)

        # Byte accounting: XLA's cost_analysis does NOT multiply a scan
        # body by its trip count, so the chunk executable under-reports
        # per-step traffic by ~chunk_size.  AOT-compile ONE step instead,
        # with the loop-invariant statics passed as INPUTS (the scan body
        # reads them every iteration, so counting them as operand reads is
        # the faithful per-step cost) and the state donated (the scan
        # carry aliases in place).
        import jax.numpy as jnp

        from epidemicsimulator_tpu.engine.fastpath import (
            make_rider_statics, wants_fused_citizen, wants_sortless_dense,
            wants_sortless_work,
        )
        from epidemicsimulator_tpu.engine.step import step as step_fn

        class _Probe:
            status_ws = None

        rs = None
        if (
            wants_sortless_work(wd, cfg, _Probe())
            or wants_sortless_dense(wd, cfg, _Probe())
            or cfg.use_replicated_orders
        ):
            rs = make_rider_statics(wd)
        statics = None
        if wants_fused_citizen(wd, cfg):
            from epidemicsimulator_tpu.ops.pallas_citizen import (
                make_citizen_statics,
            )

            statics = jax.tree.map(jnp.asarray, make_citizen_statics(wd))

        go = None
        if cfg.debug_force_gates is not None:
            go = tuple(
                None if g is None else jnp.asarray(bool(g))
                for g in cfg.debug_force_gates
            )

        def one(world_a, params_a, state_a, statics_a, rs_a):
            ns, out = step_fn(
                world_a, params_a, cfg, state_a,
                fused_statics=statics_a, rider_statics=rs_a,
                gate_overrides=go,
            )
            return ns, out.seirv

        state2 = init_state(world, seed=0, starting_infected=seed_inf)
        lowered = jax.jit(one, donate_argnums=(2,)).lower(
            wd, params, state2, statics, rs
        )
        gb_step = _bytes_accessed(lowered.compile()) / 1e9
        frac = (
            None if gb_step is None
            else gb_step * 1e9 / (ms * 1e-3 * HBM_BYTES_PER_S)
        )
        res[arm] = {
            "ms_per_step": round(ms, 2),
            "cost_analysis_gb_per_step": (
                None if gb_step is None else round(gb_step, 3)
            ),
            "roofline_fraction": (
                None if frac is None else round(frac, 3)
            ),
            "final_seirv": census,
        }
        print(f"{regime}/{arm}: {ms:.2f} ms/step, "
              f"{gb_step if gb_step is None else round(gb_step, 3)} GB/step, "
              f"roofline {frac if frac is None else round(frac, 3)}",
              flush=True)
    res["hbm_gb_per_s"] = HBM_BYTES_PER_S / 1e9
    res["device"] = jax.devices()[0].device_kind
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regime", choices=["yh", "uk"], required=True)
    args = ap.parse_args()

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    res = run_regime(args.regime)
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "summary.json")
    summary = {}
    if os.path.exists(path):
        with open(path) as f:
            summary = json.load(f)
    summary[args.regime] = res
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
