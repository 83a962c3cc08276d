"""Edge cases: degenerate worlds, empty groups, tiny populations."""

import dataclasses

import numpy as np
import pytest

from epidemicsimulator_tpu import (
    Params,
    SimConfig,
    generate_synthetic_world,
    make_world,
)
from epidemicsimulator_tpu.engine.scan import run
from epidemicsimulator_tpu.engine.state import init_state


def _run_world(world, steps=30, exposure=0.05, seed_infected=2):
    base = Params.covid()
    params = Params(
        dataclasses.replace(base.disease, exposure_chance=exposure,
                            vaccination_rate=5),
        base.thresholds,
    )
    cfg = SimConfig(max_steps=steps, chunk_size=steps,
                    max_vaccinations_per_step=8)
    st = init_state(world, seed=0, starting_infected=seed_infected)
    _, out = run(world.device_put(), params, cfg, st)
    assert (out.seirv.sum(axis=1) == world.n_citizens).all()
    return out


def test_tiny_world_two_citizens():
    w = make_world(
        age=np.array([30, 40]), occupation=np.array([1, 1]),
        home_building=np.array([0, 0]), work_building=np.array([1, 1]),
        home_oa=np.array([0, 0]), work_oa=np.array([0, 0]),
        room=np.array([0, 0]), is_school_work=np.array([False, False]),
        uses_transport=np.array([False, True]),
        mask_compliant=np.array([True, False]),
        n_buildings=2, n_rooms=0, n_output_areas=1,
    )
    _run_world(w, seed_infected=1)


def test_no_transport_world():
    w = generate_synthetic_world(2000, n_output_areas=4, seed=0)
    w = dataclasses.replace(
        w,
        uses_transport=np.zeros(w.n_citizens, bool),
        ws_uses_transport=np.zeros(w.n_citizens, bool),
        rider_perm=np.zeros(0, np.int32),
        rider_route=np.zeros(0, np.int32),
        rider_mask_compliant=np.zeros(0, bool),
    )
    _run_world(w)


def test_everyone_infected_burns_out():
    w = generate_synthetic_world(800, n_output_areas=2, seed=1)
    base = Params.covid()
    params = Params(
        dataclasses.replace(base.disease, exposed_time=2, infected_time=4),
        base.thresholds,
    )
    cfg = SimConfig(max_steps=600, chunk_size=100, max_vaccinations_per_step=16)
    st = init_state(w, seed=0, starting_infected=0)
    import jax.numpy as jnp

    from epidemicsimulator_tpu.engine.state import with_status
    st = with_status(st, w, jnp.full(w.n_citizens, 2, jnp.int8))
    _, out = run(w.device_put(), params, cfg, st)
    # everyone recovers within infected_time+1 and the run early-exits once
    # S==0 and E==0 and I==0 (statistics.rs:289-291 semantics)
    assert out.seirv.shape[0] < 600
    assert out.seirv[-1, 3] == w.n_citizens


def test_one_citizen_per_household():
    n = 500
    w = make_world(
        age=np.full(n, 30), occupation=np.full(n, 1),
        home_building=np.arange(n), work_building=np.full(n, n),
        home_oa=np.zeros(n), work_oa=np.zeros(n),
        room=np.zeros(n), is_school_work=np.zeros(n, bool),
        uses_transport=np.zeros(n, bool), mask_compliant=np.zeros(n, bool),
        n_buildings=n + 1, n_rooms=0, n_output_areas=1,
    )
    assert w.max_household_size == 1
    out = _run_world(w, steps=40, exposure=0.02, seed_infected=3)
    # singleton households -> home exposure impossible; all spread is at work
    assert out.seirv[:, 1].max() >= 0


def test_giant_household_fallback_to_scans():
    # one household of 60 forces the run-total scan fallback (K > 24)
    n = 60
    w = make_world(
        age=np.full(n, 30), occupation=np.full(n, 10),  # unemployed
        home_building=np.zeros(n), work_building=np.zeros(n),
        home_oa=np.zeros(n), work_oa=np.zeros(n),
        room=np.zeros(n), is_school_work=np.zeros(n, bool),
        uses_transport=np.zeros(n, bool), mask_compliant=np.zeros(n, bool),
        n_buildings=1, n_rooms=0, n_output_areas=1,
    )
    assert w.max_household_size == 60
    out = _run_world(w, steps=20, exposure=0.3, seed_infected=1)
    # communal living: the one infected exposes housemates
    assert out.seirv[-1, 1] + out.seirv[-1, 2] > 1


def test_synthetic_world_school_free():
    # more OAs per school than OAs and no teachers wanted: still builds
    w = generate_synthetic_world(1000, n_output_areas=3, seed=2,
                                 oas_per_school=3)
    _run_world(w)
