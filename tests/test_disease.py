"""SEIR timer semantics vs disease.rs:47-71, exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from epidemicsimulator_tpu import Params, SimConfig, step
from epidemicsimulator_tpu.config import (
    TIMER_DTYPE,
    STATUS_EXPOSED,
    STATUS_INFECTED,
    STATUS_RECOVERED,
    STATUS_SUSCEPTIBLE,
)
from helpers import micro_world, state_with_status


def _run_timers(status0, timer0, steps, exposed_time=96, infected_time=336):
    """Run `steps` hours with exposure disabled (p=0) and return trajectories."""
    w = micro_world(home_building=[0], work_building=[0]).device_put()
    params = Params.covid()
    params = Params(
        disease=params.disease.__class__(
            exposure_chance=0.0,
            exposed_time=exposed_time,
            infected_time=infected_time,
        ),
        thresholds=params.thresholds,
    ).as_arrays()
    cfg = SimConfig()
    st = state_with_status(w, [status0], timer=jnp.asarray([timer0], TIMER_DTYPE))
    from helpers import run_steps_scan

    _, (status_t, timer_t, *_rest) = run_steps_scan(w, params, cfg, st, steps)
    return [int(s[0]) for s in status_t], [int(t[0]) for t in timer_t]


def test_exposed_progression_to_infected():
    # Exposed(0) advances to Exposed(t+1) each hour, flipping to Infected(0)
    # on the advance where the stored timer has reached exposed_time.
    stats, timers = _run_timers(STATUS_EXPOSED, 0, 100, exposed_time=5)
    # hours 1..5: Exposed with timer 1..5; hour 6: timer(5) >= 5 -> Infected(0)
    assert stats[:5] == [STATUS_EXPOSED] * 5
    assert timers[:5] == [1, 2, 3, 4, 5]
    assert stats[5] == STATUS_INFECTED
    assert timers[5] == 0


def test_infected_progression_to_recovered():
    stats, timers = _run_timers(STATUS_INFECTED, 0, 10, infected_time=4)
    assert stats[:4] == [STATUS_INFECTED] * 4
    assert timers[:4] == [1, 2, 3, 4]
    assert stats[4] == STATUS_RECOVERED
    # Recovered is terminal
    assert stats[5:] == [STATUS_RECOVERED] * 5


def test_full_covid_timeline():
    # With the real COVID parameters: E for 96 advances, I for 336.
    stats, _ = _run_timers(STATUS_EXPOSED, 0, 450)
    assert stats[95] == STATUS_EXPOSED
    assert stats[96] == STATUS_INFECTED  # 97th advance
    assert stats[96 + 336] == STATUS_INFECTED
    assert stats[96 + 337] == STATUS_RECOVERED


def test_susceptible_stable_without_exposure():
    stats, timers = _run_timers(STATUS_SUSCEPTIBLE, 0, 30)
    assert stats == [STATUS_SUSCEPTIBLE] * 30
    assert timers == [0] * 30
