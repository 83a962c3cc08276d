"""UK-scale (63M) SHARDED epidemic runs — VERDICT r4 next #1.

Two modes, one artifact (sample_results/uk_sharded/summary.json):

* ``--mode real1dev`` (TPU): the missing UK-scale sharded perf number.
  Builds the 63M world host-side, partitions at 1 device, uploads the
  shard tables through the tunnel, and times `run_fast_sharded`'s runner
  in the pinned moving regime (the probe_uk_moving protocol: thresholds
  disabled, 0.1% seeded) — then the single-chip dense fast path in the
  SAME process for the apples-to-apples ratio (tpu-tunnel variance rule:
  A/B arms share one process).

* ``--mode virtual8`` (CPU, 8 virtual devices): the sustained sharded
  epidemic the 2-step uk_partition smoke never was.  63M, >=500 steps
  through engine/simulator.py's sharded path with the recorder live and
  ONE checkpoint/resume cycle: phase 1 runs 300 steps checkpointing at
  hour 250; phase 2 resumes from the hour-250 snapshot and runs to 500.
  Phase 2's first 50 hours must match phase 1's hours 251-300 BITWISE
  (sharded resume exactness at full UK scale), census conserved at 63M
  every step, and every intervention fires (1.2% seeding clears each
  threshold, interventions.rs:110-184 semantics).

Usage:
  python tools/run_uk_sharded.py --mode real1dev
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/run_uk_sharded.py --mode virtual8
"""

import argparse
import dataclasses
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "sample_results/uk_sharded"


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _load_summary():
    path = os.path.join(OUT, "summary.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"n_citizens": None}


def _save_summary(s):
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(s, f, indent=1)


def real1dev(args):
    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.config import InterventionThresholds
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state
    from epidemicsimulator_tpu.parallel.fastmesh import (
        init_sharded_state, make_fast_sharded_runner,
    )
    from epidemicsimulator_tpu.parallel.mesh import make_mesh
    from epidemicsimulator_tpu.parallel.partition import partition_world

    res = {"device": None, "phases_s": {}}
    t0 = time.perf_counter()
    _ = int(jnp.arange(8).sum())
    res["phases_s"]["attach"] = round(time.perf_counter() - t0, 1)
    res["device"] = jax.devices()[0].device_kind
    print(f"attach {res['phases_s']['attach']}s on {res['device']}",
          flush=True)

    t0 = time.perf_counter()
    world = generate_synthetic_world(args.n, n_output_areas=args.oas, seed=0)
    res["phases_s"]["world_build_host"] = round(time.perf_counter() - t0, 1)
    print(f"host world {res['phases_s']['world_build_host']}s "
          f"(rss {rss_gb():.1f} GB)", flush=True)

    t0 = time.perf_counter()
    sw = partition_world(world, 1)
    res["phases_s"]["partition"] = round(time.perf_counter() - t0, 1)
    print(f"partition(1) {res['phases_s']['partition']}s "
          f"(rss {rss_gb():.1f} GB)", flush=True)

    # moving regime pinned (probe_uk_moving protocol), per-OA recording off
    params = Params(
        Params.covid().disease,
        InterventionThresholds(
            lockdown=-1.0, vaccination=-1.0,
            mask_public_transport=-1.0, mask_everywhere=-1.0,
        ),
    ).as_arrays()
    seed_inf = max(1, round(args.n * 0.001))
    cfg = SimConfig(
        max_steps=10**9, chunk_size=args.chunk,
        record_exposures_per_oa=False,
    )

    mesh = make_mesh(1)
    t0 = time.perf_counter()
    shard = NamedSharding(mesh, P("pop"))
    w_sh = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), shard)
        if hasattr(x, "shape") else x,
        sw,
    )
    jax.block_until_ready([x for x in jax.tree.leaves(w_sh)
                           if hasattr(x, "shape")])
    res["phases_s"]["shard_upload"] = round(time.perf_counter() - t0, 1)
    print(f"shard upload {res['phases_s']['shard_upload']}s", flush=True)

    st = init_sharded_state(world, sw, seed=0, starting_infected=seed_inf,
                            cfg=cfg)
    runner = make_fast_sharded_runner(sw, cfg, mesh)
    t0 = time.perf_counter()
    st, out = runner(w_sh, params, st)
    _ = np.asarray(out.seirv)
    res["phases_s"]["sharded_compile_chunk1"] = round(
        time.perf_counter() - t0, 1
    )
    print(f"sharded compile+chunk1 "
          f"{res['phases_s']['sharded_compile_chunk1']}s", flush=True)
    st, out = runner(w_sh, params, st)  # warm
    _ = np.asarray(out.seirv)
    t0 = time.perf_counter()
    for _i in range(args.chunks):
        st, out = runner(w_sh, params, st)
    final = np.asarray(out.seirv)  # forces through the tunnel
    ms_sh = (time.perf_counter() - t0) / (args.chunks * args.chunk) * 1e3
    res["sharded_1dev_ms_per_step"] = round(ms_sh, 2)
    res["sharded_final_seirv"] = final[-1].tolist()
    print(f"sharded-1dev {ms_sh:.2f} ms/step "
          f"(census {final[-1].tolist()})", flush=True)
    del w_sh, st, runner, sw

    # dense single-chip arm, same process, same world content (the host
    # builder and device builder are equality-tested; host world is
    # already in RAM, device_put rides the same upload path the sharded
    # arm paid)
    t0 = time.perf_counter()
    wd = world.device_put()
    jax.block_until_ready(wd.age)
    res["phases_s"]["dense_upload"] = round(time.perf_counter() - t0, 1)
    st1 = init_state(world, seed=0, starting_infected=seed_inf)
    chunk_fn = make_chunk_runner(wd, cfg)
    t0 = time.perf_counter()
    st1, out1 = chunk_fn(params, st1)
    _ = np.asarray(out1.seirv)
    res["phases_s"]["dense_compile_chunk1"] = round(
        time.perf_counter() - t0, 1
    )
    st1, out1 = chunk_fn(params, st1)
    _ = np.asarray(out1.seirv)
    t0 = time.perf_counter()
    for _i in range(args.chunks):
        st1, out1 = chunk_fn(params, st1)
    final1 = np.asarray(out1.seirv)
    ms_d = (time.perf_counter() - t0) / (args.chunks * args.chunk) * 1e3
    res["dense_ms_per_step"] = round(ms_d, 2)
    res["dense_final_seirv"] = final1[-1].tolist()
    res["ratio_sharded_over_dense"] = round(ms_sh / ms_d, 2)
    # Transport is live, so the two engines are distributionally — not
    # bitwise — matched: the sharded bus machinery folds the shard index
    # into its keys (FIDELITY.md's one documented divergence; bitwise
    # equality holds transport-off, asserted every dryrun in
    # __graft_entry__.py).  Record the drift so the artifact shows the
    # same epidemic within bus-stream noise.
    res["census_max_abs_drift"] = int(np.abs(final - final1).max())
    res["census_drift_is_documented_bus_divergence"] = True
    print(f"dense {ms_d:.2f} ms/step; ratio {ms_sh / ms_d:.2f}; "
          f"census drift {res['census_max_abs_drift']}",
          flush=True)

    s = _load_summary()
    s.update(n_citizens=args.n, n_output_areas=args.oas)
    s["real1dev"] = res
    _save_summary(s)


def virtual8(args):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) >= 8, "need 8 virtual devices (XLA_FLAGS)"
    import numpy as np

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.engine.simulator import Simulator

    res = {"n_dev": 8, "phases_s": {}}
    t0 = time.perf_counter()
    world = generate_synthetic_world(args.n, n_output_areas=args.oas, seed=0)
    res["phases_s"]["world_build_host"] = round(time.perf_counter() - t0, 1)
    print(f"host world {res['phases_s']['world_build_host']}s", flush=True)

    # 1.2% seeded: clears every intervention threshold at step 1 (the
    # dryrun_multichip seeding rationale)
    seed_inf = round(args.n * 0.012)
    params = Params.covid()
    os.makedirs(OUT, exist_ok=True)
    ckpt = os.path.join(OUT, "ckpt_63m.npz")
    if os.path.exists(ckpt):
        os.remove(ckpt)
    outdir1 = os.path.join(OUT, "phase1_artifacts")

    cfg1 = SimConfig(max_steps=300, chunk_size=50,
                     starting_infected=seed_inf)
    t0 = time.perf_counter()
    sim1 = Simulator(world, params, cfg1, seed=0, devices=8,
                     checkpoint_path=ckpt, checkpoint_every_chunks=5)
    seirv1 = sim1.simulate(output_dir=outdir1)
    res["phases_s"]["phase1_300_steps"] = round(time.perf_counter() - t0, 1)
    assert os.path.exists(ckpt), "hour-250 checkpoint never written"
    assert (seirv1.sum(axis=1) == args.n).all(), "census leak phase 1"

    # phase 2: resume from hour 250, run to 500 — first 50 hours must be
    # bitwise phase 1's hours 251..300
    outdir2 = os.path.join(OUT, "phase2_artifacts")
    cfg2 = SimConfig(max_steps=500, chunk_size=50,
                     starting_infected=seed_inf)
    t0 = time.perf_counter()
    sim2 = Simulator(world, params, cfg2, seed=0, devices=8,
                     checkpoint_path=ckpt, checkpoint_every_chunks=0)
    assert int(sim2.state.hour) == 250, f"resume hour {int(sim2.state.hour)}"
    seirv2 = sim2.simulate(output_dir=outdir2)
    res["phases_s"]["phase2_resume_to_500"] = round(
        time.perf_counter() - t0, 1
    )
    assert (seirv2.sum(axis=1) == args.n).all(), "census leak phase 2"
    np.testing.assert_array_equal(
        seirv1[250:300], seirv2[:50],
        err_msg="resumed trajectory diverged from the checkpointed run",
    )

    res.update(
        steps_total=int(250 + seirv2.shape[0]),
        seeded=seed_inf,
        final_seirv=seirv2[-1].tolist(),
        census_conserved=True,
        resume_bitwise_50h=True,
        checkpoint_resume_hour=250,
        rss_gb=round(rss_gb(), 1),
    )
    # intervention evidence: at hour 300 the seeded infected (I->R at
    # 336h) still hold every threshold open, and V grows at
    # vaccination_rate/step from activation
    res["interventions"] = {
        "vaccinated_final": int(seirv2[-1, 4]),
        "lockdown_at_hour_300": bool(np.asarray(sim1.state.lockdown)),
        "mask_status_at_hour_300": int(np.asarray(sim1.state.mask_status)),
    }
    assert res["interventions"]["vaccinated_final"] > 0
    assert res["interventions"]["lockdown_at_hour_300"]
    assert res["interventions"]["mask_status_at_hour_300"] >= 1
    print(json.dumps(res, indent=1), flush=True)

    s = _load_summary()
    s.update(n_citizens=args.n, n_output_areas=args.oas)
    s["virtual8_sustained"] = res
    _save_summary(s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["real1dev", "virtual8"], required=True)
    ap.add_argument("--n", type=int, default=63_000_000)
    ap.add_argument("--oas", type=int, default=227_759)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--chunks", type=int, default=4)
    args = ap.parse_args()
    if args.mode == "real1dev":
        real1dev(args)
    else:
        virtual8(args)


if __name__ == "__main__":
    main()
