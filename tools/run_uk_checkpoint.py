"""63M single-chip checkpoint/resume cycle — VERDICT r4 #9.

The 5,000-hour full-UK runs (213 s compute) are long enough to be worth
protecting; this tool measures what protecting them costs and proves the
resume is exact:

1. device-build the 63M world, seed 360k (all interventions live),
   run 100 steps (2 x 50-step chunks);
2. snapshot the SimState (engine/checkpoint.py npz) — timed, sized; at
   this scale the cost is dominated by the device->host pull of the
   ~0.5 GB of per-citizen lanes through the tunnel, so both the pull and
   the compress+write are reported separately;
3. arm A continues 100 more steps from the live state; arm B loads the
   snapshot and runs the same 100 steps with the same (cached) runner;
4. exactness: the two 100-step SEIRV series must be BITWISE equal, and
   the final status/timer lanes must agree under a device-side weighted
   checksum (no second 0.5 GB pull just to compare).

Writes sample_results/uk_checkpoint/summary.json; docs/PERF.md quotes
the numbers.  Reference: the reference has no runtime checkpointing at
all (SURVEY.md §5) — its runs are minutes; ours protect hour-scale jobs.

Usage: python tools/run_uk_checkpoint.py [--n 63000000] [--chunk 50]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "sample_results/uk_checkpoint"


def lane_checksum(x):
    """Order-sensitive device-side checksum of an int lane: two wrapped
    u32 weighted sums (x64 is off on this runtime).  Cheap (one fused
    pass), and any single-lane difference at any position flips it."""
    import jax.numpy as jnp

    n = x.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    v = x.astype(jnp.uint32)
    s1 = jnp.sum(v * (idx % jnp.uint32(1_000_003) + jnp.uint32(1)))
    s2 = jnp.sum(v * (idx * jnp.uint32(2_654_435_761)))
    return (int(s1), int(s2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=63_000_000)
    ap.add_argument("--oas", type=int, default=227_759)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--path", default="/tmp/uk_ckpt.npz")
    args = ap.parse_args()

    from epidemicsimulator_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import numpy as np

    from epidemicsimulator_tpu import (
        Params, SimConfig, generate_synthetic_world_device,
    )
    from epidemicsimulator_tpu.engine.checkpoint import load_state, save_state
    from epidemicsimulator_tpu.engine.fastpath import wants_fixed_priority_vax
    from epidemicsimulator_tpu.engine.scan import make_chunk_runner
    from epidemicsimulator_tpu.engine.state import init_state

    res = {"n_citizens": args.n, "chunk_size": args.chunk}
    t0 = time.perf_counter()
    _ = int(jax.numpy.arange(8).sum())
    print(f"attach {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    world = generate_synthetic_world_device(args.n, n_output_areas=args.oas,
                                            seed=0)
    jax.block_until_ready(world.age)
    res["world_build_device_s"] = round(time.perf_counter() - t0, 1)
    print(f"world on-device {res['world_build_device_s']}s", flush=True)

    cfg = SimConfig(max_steps=10**9, chunk_size=args.chunk)
    params = Params.covid().as_arrays()
    state = init_state(
        world, seed=0, starting_infected=360_000,
        fixed_priority_vax=wants_fixed_priority_vax(world, cfg),
    )
    chunk_fn = make_chunk_runner(world, cfg)

    t0 = time.perf_counter()
    state, out = chunk_fn(params, state)
    jax.block_until_ready(out.seirv)
    res["compile_chunk1_s"] = round(time.perf_counter() - t0, 1)
    state, out = chunk_fn(params, state)
    census100 = np.asarray(out.seirv)[-1]
    print(f"100 steps done, census {census100.tolist()}", flush=True)

    # --- snapshot (timed: device->host pull vs compress+write) ---------
    import dataclasses as _dc

    t0 = time.perf_counter()
    host_state = _dc.replace(
        jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x,
            _dc.replace(state, rng_key=None),
        ),
        rng_key=state.rng_key,  # save_state key_data-serialises it itself
    )
    pull_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    save_state(args.path, host_state)
    write_s = time.perf_counter() - t0
    size_mb = os.path.getsize(args.path) / 1e6
    lane_mb = sum(
        v.nbytes for v in jax.tree.leaves(host_state)
        if isinstance(v, np.ndarray)
    ) / 1e6
    res["snapshot"] = {
        "pull_s": round(pull_s, 1),
        "compress_write_s": round(write_s, 1),
        "size_mb": round(size_mb, 1),
        "uncompressed_state_mb": round(lane_mb, 1),
    }
    print(f"snapshot: pull {pull_s:.1f}s, write {write_s:.1f}s, "
          f"{size_mb:.1f} MB (raw {lane_mb:.1f} MB)", flush=True)

    # --- arm A: continue live --------------------------------------------
    seirv_a = []
    st_a = state
    for _ in range(2):
        st_a, out = chunk_fn(params, st_a)
        seirv_a.append(np.asarray(out.seirv))
    seirv_a = np.concatenate(seirv_a)
    sum_a = (lane_checksum(st_a.status), lane_checksum(st_a.timer))

    # --- arm B: resume from the snapshot ---------------------------------
    t0 = time.perf_counter()
    st_b, _ = load_state(args.path)
    jax.block_until_ready(st_b.status)
    res["load_s"] = round(time.perf_counter() - t0, 1)
    assert int(st_b.hour) == 100, f"resume hour {int(st_b.hour)}"
    seirv_b = []
    for _ in range(2):
        st_b, out = chunk_fn(params, st_b)
        seirv_b.append(np.asarray(out.seirv))
    seirv_b = np.concatenate(seirv_b)
    sum_b = (lane_checksum(st_b.status), lane_checksum(st_b.timer))

    np.testing.assert_array_equal(
        seirv_a, seirv_b,
        err_msg="resumed 63M trajectory diverged from the live run",
    )
    assert sum_a == sum_b, f"final lane checksums differ: {sum_a} {sum_b}"
    res.update(
        steps_total=200,
        resume_bitwise_100_steps=True,
        final_lane_checksums_equal=True,
        final_seirv=seirv_b[-1].tolist(),
        interventions_live={
            "vaccinated": int(seirv_b[-1][4]),
            "lockdown": bool(np.asarray(st_a.lockdown)),
        },
    )
    assert res["interventions_live"]["vaccinated"] > 0

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
