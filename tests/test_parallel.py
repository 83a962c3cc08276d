"""Population sharding over a virtual 8-device CPU mesh: conservation,
distributional agreement with the single-device engine, padding hygiene."""

import dataclasses

import jax
import numpy as np
import pytest

from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
from epidemicsimulator_tpu.config import STATUS_INFECTED
from epidemicsimulator_tpu.engine.scan import run
from epidemicsimulator_tpu.engine.state import init_state
from epidemicsimulator_tpu.parallel.mesh import (
    make_mesh,
    pad_state_for_mesh,
    pad_world_for_mesh,
    run_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(n=4003):
    world = generate_synthetic_world(n, n_output_areas=8, seed=2)
    base = Params.covid()
    params = Params(
        dataclasses.replace(
            base.disease, exposure_chance=0.01, vaccination_rate=64
        ),
        base.thresholds,
    )
    cfg = SimConfig(max_steps=48, chunk_size=24, max_vaccinations_per_step=64)
    return world, params, cfg


def test_sharded_runs_and_conserves_population():
    world, params, cfg = _setup()
    mesh = make_mesh(8)
    state = init_state(world, seed=0, starting_infected=40)
    _, out = run_sharded(world, params, cfg, state, mesh)
    seirv = out.seirv
    n_padded = world.n_citizens + ((-world.n_citizens) % 8)
    assert (seirv.sum(axis=1) == n_padded).all()
    assert (seirv >= 0).all()
    # epidemic actually progressed
    assert seirv[-1, 1] + seirv[-1, 2] > 0


def test_padding_is_inert():
    world, params, cfg = _setup(n=4003)
    padded = pad_world_for_mesh(world, 8)
    assert padded.n_citizens == 4008
    state = init_state(world, seed=0, starting_infected=10)
    st = pad_state_for_mesh(state, padded.n_citizens)
    # pads recovered, never eligible, never transported
    assert (np.asarray(st.status[-5:]) == 3).all()
    assert not np.asarray(padded.uses_transport[-5:]).any()


def test_sharded_matches_single_device_distribution():
    world, params, cfg = _setup(n=4000)  # divisible: identical populations
    mesh = make_mesh(8)

    finals_single, finals_sharded = [], []
    for s in range(6):
        st = init_state(world, seed=100 + s, starting_infected=40)
        _, out1 = run(world.device_put(), params, cfg, st)
        finals_single.append(out1.seirv[-1, 0])

        st = init_state(world, seed=200 + s, starting_infected=40)
        _, out8 = run_sharded(world, params, cfg, st, mesh)
        finals_sharded.append(out8.seirv[-1, 0])

    a, b = np.array(finals_single, float), np.array(finals_sharded, float)
    se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)) + 1e-9
    z = abs(a.mean() - b.mean()) / se
    assert z < 5.0, f"single {a.mean():.0f}±{a.std():.0f} vs sharded {b.mean():.0f}±{b.std():.0f} (z={z:.2f})"
