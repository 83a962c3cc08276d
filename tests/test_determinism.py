"""Determinism: same seed => identical trajectories.

The reference relies on Rust's lock discipline and accepts
order-nondeterministic thread_rng streams; the pure-functional scan makes
runs exactly reproducible, which is this framework's replacement for race
detection (SURVEY.md §5)."""

import dataclasses

import numpy as np

from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
from epidemicsimulator_tpu.engine.scan import run
from epidemicsimulator_tpu.engine.state import init_state


def _run(world, seed):
    base = Params.covid()
    params = Params(
        dataclasses.replace(base.disease, exposure_chance=0.01, vaccination_rate=25),
        base.thresholds,
    )
    cfg = SimConfig(max_steps=96, chunk_size=48, max_vaccinations_per_step=32)
    st = init_state(world, seed=seed, starting_infected=25)
    _, out = run(world.device_put(), params, cfg, st)
    return out


def test_same_seed_identical():
    world = generate_synthetic_world(4000, n_output_areas=8, seed=1)
    a = _run(world, seed=5)
    b = _run(world, seed=5)
    assert (a.seirv == b.seirv).all()
    assert (a.exposures_per_oa == b.exposures_per_oa).all()
    assert (a.n_bus_exposures == b.n_bus_exposures).all()


def test_different_seed_differs():
    world = generate_synthetic_world(4000, n_output_areas=8, seed=1)
    a = _run(world, seed=5)
    b = _run(world, seed=6)
    assert not (a.seirv == b.seirv).all()
