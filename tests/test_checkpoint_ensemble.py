"""Checkpoint/resume bit-exactness + vmapped ensembles."""

import dataclasses

import jax
import numpy as np

from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
from epidemicsimulator_tpu.engine.checkpoint import load_state, save_state
from epidemicsimulator_tpu.engine.ensemble import run_ensemble, stack_params
from epidemicsimulator_tpu.engine.scan import make_chunk_runner
from epidemicsimulator_tpu.engine.state import init_state


def _setup():
    world = generate_synthetic_world(3000, n_output_areas=6, seed=2).device_put()
    base = Params.covid()
    params = Params(
        dataclasses.replace(base.disease, exposure_chance=0.01, vaccination_rate=20),
        base.thresholds,
    ).as_arrays()
    cfg = SimConfig(max_steps=96, chunk_size=24, max_vaccinations_per_step=32)
    return world, params, cfg


def test_checkpoint_resume_bit_exact(tmp_path):
    world, params, cfg = _setup()
    runner = make_chunk_runner(world, cfg)

    # straight run: 4 chunks
    st = init_state(world, seed=0, starting_infected=30)
    s1 = st
    outs = []
    for _ in range(4):
        s1, out = runner(params, s1)
        outs.append(np.asarray(out.seirv))
    full = np.concatenate(outs)

    # checkpointed run: 2 chunks, save, load, 2 more
    st = init_state(world, seed=0, starting_infected=30)
    s2 = st
    outs2 = []
    for _ in range(2):
        s2, out = runner(params, s2)
        outs2.append(np.asarray(out.seirv))
    ckpt = str(tmp_path / "state.npz")
    save_state(ckpt, s2, np.concatenate(outs2))
    s3, seirv_prev = load_state(ckpt)
    assert (seirv_prev == np.concatenate(outs2)).all()
    for _ in range(2):
        s3, out = runner(params, s3)
        outs2.append(np.asarray(out.seirv))
    resumed = np.concatenate(outs2)

    assert (full == resumed).all(), "resume is not bit-exact"


def test_ensemble_replicates_vary_and_match_scalar_runs():
    world, _, cfg = _setup()
    base = Params.covid()
    params_list = [
        Params(
            dataclasses.replace(
                base.disease, exposure_chance=0.005 * (r + 1), vaccination_rate=20
            ),
            base.thresholds,
        )
        for r in range(4)
    ]
    seirv = run_ensemble(world, params_list, cfg, seed=7)
    assert seirv.shape == (4, cfg.max_steps, 5)
    # population conserved in every replicate at every step
    assert (seirv.sum(axis=2) == world.n_citizens).all()
    # higher exposure chance -> no smaller final attack (monotone trend,
    # allowing stochastic slack on the weakest pair)
    final_s = seirv[:, -1, 0]
    assert final_s[0] >= final_s[-1]
