"""Fast path (scan/sort formulation) vs portable step: exact agreement.

With exposure_chance=1.0 every positive-pressure draw succeeds, so exposure
becomes deterministic and the two formulations must produce bitwise-identical
state trajectories (transport disabled: bus composition is genuinely random
and is covered by the distributional oracle tests instead)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
from epidemicsimulator_tpu.config import STATUS_INFECTED
from epidemicsimulator_tpu.engine.state import init_state
from epidemicsimulator_tpu.engine.step import step
from epidemicsimulator_tpu.ops.runsums import run_totals


def test_run_totals_matches_segment_sum():
    rng = np.random.default_rng(0)
    n = 10_000
    # random contiguous runs
    sizes = rng.integers(1, 40, 600)
    ids = np.repeat(np.arange(len(sizes)), sizes)[:n]
    ids = ids[: n // 1]
    n = len(ids)
    start = np.r_[True, ids[1:] != ids[:-1]]
    end = np.r_[ids[1:] != ids[:-1], True]
    v = rng.integers(0, 3, n).astype(np.int32)
    got = np.asarray(
        jax.jit(run_totals)(jnp.asarray(v), jnp.asarray(start), jnp.asarray(end))
    )
    want = np.bincount(ids, weights=v)[ids].astype(np.int32)
    assert (got == want).all()


@pytest.mark.parametrize("steps,transport", [(60, False), (60, True)])
def test_fast_and_portable_steps_agree_deterministically(steps, transport):
    world = generate_synthetic_world(3000, n_output_areas=6, seed=4)
    if not transport:
        # disable transport entirely
        world = dataclasses.replace(
            world,
            uses_transport=np.zeros(world.n_citizens, bool),
            ws_uses_transport=np.zeros(world.n_citizens, bool),
            rider_perm=np.zeros(0, np.int32),
            rider_route=np.zeros(0, np.int32),
            rider_mask_compliant=np.zeros(0, bool),
        )
    # with transport: bus_capacity below exceeds any route's ridership, so
    # each route forms exactly one bus and composition is deterministic too
    base = Params.covid()
    # exposure_chance=1 and masks disabled => every exposure draw has
    # probability exactly 0 or 1, so the two formulations must agree
    # bitwise (their RNG streams differ; only deterministic draws compare).
    params = Params(
        dataclasses.replace(
            base.disease, exposure_chance=1.0, exposed_time=6, infected_time=12,
            vaccination_rate=0,
        ),
        dataclasses.replace(
            base.thresholds, vaccination=-1.0,
            mask_public_transport=2.0, mask_everywhere=2.0,
        ),
    ).as_arrays()

    trajs = []
    for fast in (True, False):
        cfg = SimConfig(
            use_fast_path=fast,
            max_vaccinations_per_step=1,
            bus_capacity=8192 if transport else 20,
        )
        st = init_state(world, seed=0, starting_infected=0)
        status0 = np.zeros(world.n_citizens, np.int8)
        status0[::307] = STATUS_INFECTED
        from epidemicsimulator_tpu.engine.state import with_status
        st = with_status(st, world, status0)
        wd = world.device_put()
        jstep = jax.jit(lambda w, p, s: step(w, p, cfg, s))
        rows = []
        for _ in range(steps):
            st, out = jstep(wd, params, st)
            rows.append(
                (
                    np.asarray(st.status).copy(),
                    np.asarray(st.at_work).copy(),
                    np.asarray(out.seirv).copy(),
                    np.asarray(out.exposures_per_oa).copy(),
                    bool(out.lockdown),
                    int(out.mask_status),
                )
            )
        trajs.append(rows)

    for t, (a, b) in enumerate(zip(*trajs)):
        assert (a[0] == b[0]).all(), f"status diverged at step {t + 1}"
        assert (a[1] == b[1]).all(), f"at_work diverged at step {t + 1}"
        assert (a[2] == b[2]).all(), f"seirv diverged at step {t + 1}: {a[2]} vs {b[2]}"
        assert (a[3] == b[3]).all(), f"per-OA exposures diverged at step {t + 1}"
        assert a[4] == b[4] and a[5] == b[5]


def test_rider_extract_sort_matches_gather():
    """The rpos packed-sort rider extract is pure data movement — it must be
    bitwise-identical to the r-sized gather fallback in every regime."""
    world = generate_synthetic_world(4000, n_output_areas=8, seed=7)
    params = Params.covid().as_arrays()
    cfg = SimConfig(use_fast_path=True, bus_capacity=20)

    trajs = []
    for use_rpos in (True, False):
        w = world if use_rpos else dataclasses.replace(world, rpos=None)
        st = init_state(w, seed=0, starting_infected=0)
        status0 = np.zeros(w.n_citizens, np.int8)
        status0[::17] = STATUS_INFECTED  # plenty of bus-borne infection
        from epidemicsimulator_tpu.engine.state import with_status
        st = with_status(st, w, status0)
        wd = w.device_put()
        jstep = jax.jit(lambda w_, p, s: step(w_, p, cfg, s))
        rows = []
        for _ in range(30):
            st, out = jstep(wd, params, st)
            rows.append(np.asarray(st.status).copy())
        trajs.append(np.stack(rows))
    np.testing.assert_array_equal(trajs[0], trajs[1])
    # the run must actually exercise the bus path (new exposures happened)
    assert (trajs[0][-1] != trajs[0][0]).any()


@pytest.mark.parametrize("slots", [8192, 2])
def test_sparse_workback_bitwise_matches_sort(slots):
    """SimConfig.use_sparse_workback (dense work branch: hit slots
    compacted + scattered through work_perm instead of the backward
    permutation sort) must be bitwise-identical to the sort — including
    with workback_slots=2, which forces the >K sort fallback on nearly
    every live work hour."""
    world = generate_synthetic_world(9_000, n_output_areas=6, seed=5)
    wd = world.device_put()
    base = Params.covid()
    params = Params(
        dataclasses.replace(base.disease, exposure_chance=0.9),
        base.thresholds,
    ).as_arrays()
    results = {}
    for swb in (False, True):
        cfg = SimConfig(
            use_fused_citizen=True, use_pallas_scans=False,
            use_sparse_workback=swb, workback_slots=slots,
        )
        st = init_state(wd, seed=2, starting_infected=60)
        jstep = jax.jit(lambda w, p, s: step(w, p, cfg, s))
        rows = []
        for _ in range(48):
            st, out = jstep(wd, params, st)
            rows.append(np.asarray(out.seirv))
        results[swb] = (
            rows, np.asarray(st.status), np.asarray(st.timer),
        )
    for t, (a, b) in enumerate(zip(results[False][0], results[True][0])):
        np.testing.assert_array_equal(a, b, err_msg=f"seirv step {t}")
    for k in (1, 2):
        np.testing.assert_array_equal(results[False][k], results[True][k])
    # the run must actually have produced new exposures (E pool nonzero;
    # 48h < exposed_time so conversions haven't happened yet)
    assert results[True][0][-1][1] > 0
