"""Exposure kernel semantics: household/workplace/school segment reductions,
OA gating, the u8 truncation, and analytic probability checks."""

import jax
import jax.numpy as jnp
import numpy as np

from epidemicsimulator_tpu import Params, SimConfig, step
from epidemicsimulator_tpu.config import (
    STATUS_EXPOSED,
    STATUS_INFECTED,
    STATUS_SUSCEPTIBLE,
)
from helpers import micro_world, state_with_status, step_many_keys

P = 0.05  # large exposure chance for statistical power


def _params(p=P, **kw):
    base = Params.covid()
    return Params(
        disease=base.disease.__class__(exposure_chance=p, **kw),
        thresholds=base.thresholds.__class__(
            lockdown=-1.0, vaccination=-1.0,
            mask_public_transport=2.0, mask_everywhere=2.0,
        ),
    ).as_arrays()


def _expose_once_many(world, status0, n_trials, p=P, state_overrides=None, seed0=0):
    """Run ONE step n_trials times with different keys; count exposures of
    each susceptible citizen."""
    cfg = SimConfig()
    params = _params(p)
    st = state_with_status(world, status0, **(state_overrides or {}))
    keys = jax.random.split(jax.random.key(seed0), n_trials)
    new_states, _outs = step_many_keys(world, params, cfg, st, keys)
    return np.asarray(new_states.status == STATUS_EXPOSED).sum(axis=0)


def _check_rate(observed, n, expected_p, label=""):
    se = np.sqrt(expected_p * (1 - expected_p) / n) + 1e-12
    z = abs(observed / n - expected_p) / se
    assert z < 4.5, f"{label}: {observed}/{n} vs p={expected_p:.5f} (z={z:.1f})"


def test_household_single_infected_rate():
    # Household of 5: 1 infected + 4 susceptible at home (hour 1).
    w = micro_world(
        home_building=[0] * 5, work_building=[0] * 5
    ).device_put()
    status = [STATUS_INFECTED] + [STATUS_SUSCEPTIBLE] * 4
    n_trials = 3000
    counts = _expose_once_many(w, status, n_trials)
    # Each susceptible: one draw with n=1 -> probability exactly P.
    for c in range(1, 5):
        _check_rate(counts[c], n_trials, P, f"citizen {c}")


def test_household_three_infected_binomial():
    w = micro_world(home_building=[0] * 5, work_building=[0] * 5).device_put()
    status = [STATUS_INFECTED] * 3 + [STATUS_SUSCEPTIBLE] * 2
    n_trials = 3000
    counts = _expose_once_many(w, status, n_trials)
    q = 1 - (1 - P) ** 3
    for c in (3, 4):
        _check_rate(counts[c], n_trials, q, f"citizen {c}")


def test_unemployed_single_draw_not_double():
    # work_building == home_building (the unemployed): the reference holds
    # one BuildingID so only ONE draw happens, not two.
    w = micro_world(home_building=[0, 0], work_building=[0, 0]).device_put()
    status = [STATUS_INFECTED, STATUS_SUSCEPTIBLE]
    n_trials = 4000
    counts = _expose_once_many(w, status, n_trials)
    _check_rate(counts[1], n_trials, P, "unemployed single draw")


def test_workplace_exposure_during_work_hours():
    # Two households, shared workplace.  At work hours, infected colleague
    # exposes; the susceptible's household is clean.
    w = micro_world(
        home_building=[0, 1], work_building=[2, 2], n_buildings=3
    ).device_put()
    status = [STATUS_INFECTED, STATUS_SUSCEPTIBLE]
    n_trials = 3000
    at_work = {"at_work": jnp.asarray([True, True])}
    # state hour starts at 0 -> step runs hour 1 (not a transition hour), so
    # the forced at_work positions persist through the step.
    counts = _expose_once_many(w, status, n_trials, state_overrides=at_work)
    _check_rate(counts[1], n_trials, P, "workplace")


def test_no_exposure_across_oa_gate():
    # Infected positioned at work in OA 1; susceptible colleague is at home
    # in OA 0 -> the reference skips citizens outside the building's area
    # (simulator.rs:323-325).
    # c0 lives+works in OA 0 (infected, at work); c1 lives in OA 1 but works
    # at c0's workplace in OA 0 and is at home -> outside the building's OA.
    w = micro_world(
        home_building=[0, 2],
        work_building=[1, 1],
        home_oa=[0, 1],
        work_oa=[0, 0],
        n_buildings=3,
        n_output_areas=2,
    ).device_put()
    status = [STATUS_INFECTED, STATUS_SUSCEPTIBLE]
    overrides = {"at_work": jnp.asarray([True, False])}
    counts = _expose_once_many(w, status, 400, state_overrides=overrides)
    assert counts[1] == 0


def test_same_oa_gate_allows_remote_exposure():
    # Same scenario but both in OA 0: the at-home susceptible IS exposed by
    # their workplace (registered-occupant semantics, building.rs:278-280).
    w = micro_world(
        home_building=[0, 1],
        work_building=[2, 2],
        home_oa=[0, 0],
        work_oa=[0, 0],
        n_buildings=3,
    ).device_put()
    status = [STATUS_INFECTED, STATUS_SUSCEPTIBLE]
    overrides = {"at_work": jnp.asarray([True, False])}
    n_trials = 3000
    counts = _expose_once_many(w, status, n_trials, state_overrides=overrides)
    _check_rate(counts[1], n_trials, P, "remote workplace exposure")


def test_school_room_confinement():
    # School building 2 with two rooms.  Infected student in room 0 exposes
    # room-0 classmates only; room-1 students get zero draws; but the
    # binomial n is the WHOLE school's infected count.
    w = micro_world(
        home_building=[0, 0, 1, 1],
        work_building=[2, 2, 2, 2],
        room=[0, 0, 1, 1],
        is_school_work=[True] * 4,
        n_buildings=3,
        n_rooms=2,
    ).device_put()
    status = [STATUS_INFECTED, STATUS_SUSCEPTIBLE, STATUS_SUSCEPTIBLE, STATUS_SUSCEPTIBLE]
    overrides = {"at_work": jnp.asarray([True] * 4)}
    n_trials = 3000
    counts = _expose_once_many(w, status, n_trials, state_overrides=overrides)
    _check_rate(counts[1], n_trials, P, "same room")
    assert counts[2] == 0 and counts[3] == 0


def test_school_multi_infected_draw_count():
    # 2 infected in the susceptible's room, 1 infected elsewhere in school:
    # q = 1 - (1 - binom(P, 3))^2  (2 draws, each n = 3 school-wide infected).
    w = micro_world(
        home_building=[0, 0, 1, 1],
        work_building=[2, 2, 2, 2],
        room=[0, 0, 0, 1],
        is_school_work=[True] * 4,
        n_buildings=3,
        n_rooms=2,
    ).device_put()
    status = [STATUS_INFECTED, STATUS_INFECTED, STATUS_SUSCEPTIBLE, STATUS_INFECTED]
    overrides = {"at_work": jnp.asarray([True] * 4)}
    n_trials = 3000
    counts = _expose_once_many(w, status, n_trials, state_overrides=overrides)
    q1 = 1 - (1 - P) ** 3
    q = 1 - (1 - q1) ** 2
    _check_rate(counts[2], n_trials, q, "school 2-draw")


def test_u8_truncation_of_exposure_count():
    # 256 infected in one workplace: `n as u8` wraps to 0 -> zero chance.
    n_inf = 256
    w = micro_world(
        home_building=list(range(n_inf + 1)),
        work_building=[n_inf + 1] * (n_inf + 1),
        n_buildings=n_inf + 2,
    ).device_put()
    status = [STATUS_INFECTED] * n_inf + [STATUS_SUSCEPTIBLE]
    overrides = {"at_work": jnp.asarray([True] * (n_inf + 1))}
    counts = _expose_once_many(w, status, 200, state_overrides=overrides, p=0.5)
    assert counts[n_inf] == 0, "u8 wrap at 256 infected must zero the chance"
