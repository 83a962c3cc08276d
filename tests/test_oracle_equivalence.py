"""Whole-system distributional equivalence: vectorised engine vs the scalar
oracle transcription of ESUCD semantics, on a small world over many seeds.

Stream-for-stream equality is impossible (the reference itself is
order-nondeterministic thread_rng), so we compare epidemic summary statistics
across seeds: mean final attack size and mean peak infected must agree within
combined standard error (SURVEY.md §4 'statistical tests comparing the
vectorised exposure kernel to a scalar oracle')."""

import dataclasses

import jax
import numpy as np
import pytest

from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
from epidemicsimulator_tpu.config import STATUS_INFECTED
from epidemicsimulator_tpu.engine.scan import run
from epidemicsimulator_tpu.engine.state import init_state
from oracle import Oracle

N = 600
T = 240
N_SEEDS = 12


def _world():
    return generate_synthetic_world(N, n_output_areas=4, seed=9, oas_per_school=2)


def _params(with_interventions):
    base = Params.covid()
    # Strong disease so the epidemic takes off within T steps at N=600.
    d = dataclasses.replace(
        base.disease, exposure_chance=0.02, exposed_time=24, infected_time=72,
        vaccination_rate=30,
    )
    if with_interventions:
        t = base.thresholds
    else:
        t = dataclasses.replace(
            base.thresholds,
            lockdown=-1.0, vaccination=-1.0,
            mask_public_transport=2.0, mask_everywhere=2.0,
        )
    return Params(d, t)


def _seed_status(world, n_seeded=4):
    status = np.zeros(world.n_citizens, np.int8)
    rng = np.random.default_rng(123)
    for c in rng.choice(world.n_citizens, n_seeded, replace=False):
        status[c] = STATUS_INFECTED
    return status


def _engine_runs(world, params, status0, n_seeds):
    cfg = SimConfig(max_steps=T, chunk_size=T, max_vaccinations_per_step=30)
    wd = world.device_put()
    finals, peaks = [], []
    for s in range(n_seeds):
        st = init_state(wd, seed=1000 + s, starting_infected=0)
        from epidemicsimulator_tpu.engine.state import with_status
        st = with_status(st, wd, status0)
        _, out = run(wd, params, cfg, st)
        seirv = np.asarray(out.seirv)
        finals.append(1.0 - seirv[-1, 0] / world.n_citizens)
        peaks.append(seirv[:, 2].max() / world.n_citizens)
    return np.array(finals), np.array(peaks)


def _oracle_runs(world, params, status0, n_seeds):
    finals, peaks = [], []
    for s in range(n_seeds):
        o = Oracle(world, params, seed=2000 + s)
        o.status[:] = status0
        hist = o.run(T)
        finals.append(1.0 - hist[-1, 0] / world.n_citizens)
        peaks.append(hist[:, 2].max() / world.n_citizens)
    return np.array(finals), np.array(peaks)


def _compare(a, b, label):
    se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)) + 1e-9
    z = abs(a.mean() - b.mean()) / se
    assert z < 4.0, (
        f"{label}: engine {a.mean():.4f}±{a.std():.4f} vs "
        f"oracle {b.mean():.4f}±{b.std():.4f} (z={z:.2f})"
    )


@pytest.mark.parametrize("with_interventions", [False, True])
def test_engine_matches_oracle(with_interventions):
    world = _world()
    params = _params(with_interventions)
    status0 = _seed_status(world)
    ef, ep = _engine_runs(world, params, status0, N_SEEDS)
    of, op = _oracle_runs(world, params, status0, N_SEEDS)
    _compare(ef, of, "final attack size")
    _compare(ep, op, "peak infected")
