"""Replicated-order fast path vs the classic (permutation-sort) fast path.

Unlike the fast-vs-portable comparisons (different RNG streams, only
deterministic regimes compare), the two fast formulations consume the SAME
draw streams — every uniform is indexed by a static order position — so
they must agree BITWISE in fully stochastic regimes, including live
vaccination, buses and interventions.  The twins themselves must stay
consistent with the citizen-order lanes every step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
from epidemicsimulator_tpu.config import STATUS_INFECTED
from epidemicsimulator_tpu.engine.state import init_state, with_status
from epidemicsimulator_tpu.engine.step import step


def _mk_params(fast_epidemic=True):
    base = Params.covid()
    return Params(
        dataclasses.replace(
            base.disease,
            exposure_chance=0.05,
            exposed_time=4,
            infected_time=10,
            vaccination_rate=37,
        ),
        dataclasses.replace(
            base.thresholds,
            lockdown=0.2,
            vaccination=0.01,
            mask_public_transport=0.005,
            mask_everywhere=0.02,
        ),
    ).as_arrays()


def _run(world, cfg, steps=80):
    params = _mk_params()
    st = init_state(world, seed=0, starting_infected=0)
    status0 = np.zeros(world.n_citizens, np.int8)
    status0[::101] = STATUS_INFECTED
    st = with_status(st, world, status0)
    wd = world.device_put()
    jstep = jax.jit(lambda w, p, s: step(w, p, cfg, s))
    rows = []
    for _ in range(steps):
        st, out = jstep(wd, params, st)
        rows.append(
            (
                np.asarray(st.status).copy(),
                np.asarray(out.seirv).copy(),
                np.asarray(out.exposures_per_oa).copy(),
                int(out.n_vaccinated_now),
                int(out.n_bus_exposures),
            )
        )
    return rows, st


def test_replicated_matches_classic_bitwise():
    world = generate_synthetic_world(30000, n_output_areas=16, seed=21)
    kwargs = dict(max_vaccinations_per_step=64)
    rows_rep, st_rep = _run(
        world, SimConfig(use_replicated_orders=True, **kwargs)
    )
    rows_cls, _ = _run(
        world, SimConfig(use_replicated_orders=False, **kwargs)
    )
    for t, (a, b) in enumerate(zip(rows_rep, rows_cls)):
        assert (a[0] == b[0]).all(), f"status diverged at step {t + 1}"
        assert (a[1] == b[1]).all(), f"seirv diverged at step {t + 1}: {a[1]} vs {b[1]}"
        assert (a[2] == b[2]).all(), f"per-OA diverged at step {t + 1}"
        assert a[3] == b[3] and a[4] == b[4], f"counters diverged at {t + 1}"
    # the regime actually exercised everything
    seirv = np.stack([r[1] for r in rows_rep])
    assert seirv[:, 4].max() > 0, "vaccination never ran"
    assert sum(r[4] for r in rows_rep) > 0, "no bus exposures"

    # twin consistency at the end of the run
    wp = np.asarray(world.work_perm)
    rp = np.asarray(world.rider_perm)
    np.testing.assert_array_equal(
        np.asarray(st_rep.status_ws), np.asarray(st_rep.status)[wp]
    )
    np.testing.assert_array_equal(
        np.asarray(st_rep.timer_ws), np.asarray(st_rep.timer)[wp]
    )
    np.testing.assert_array_equal(
        np.asarray(st_rep.status_r), np.asarray(st_rep.status)[rp]
    )
    np.testing.assert_array_equal(
        np.asarray(st_rep.timer_r), np.asarray(st_rep.timer)[rp]
    )
    np.testing.assert_array_equal(
        np.asarray(st_rep.on_bus_r), np.asarray(st_rep.on_bus)[rp]
    )


def test_replicated_dense_fallback():
    """Force the sparse transports to overflow (tiny K): the dense
    permutation fallbacks must keep trajectories identical."""
    world = generate_synthetic_world(12000, n_output_areas=8, seed=5)
    rows_tiny, st_tiny = _run(
        world,
        SimConfig(
            use_replicated_orders=True, sparse_transport_slots=4,
            max_vaccinations_per_step=64,
        ),
        steps=60,
    )
    rows_cls, _ = _run(
        world,
        SimConfig(use_replicated_orders=False, max_vaccinations_per_step=64),
        steps=60,
    )
    for t, (a, b) in enumerate(zip(rows_tiny, rows_cls)):
        assert (a[0] == b[0]).all(), f"status diverged at step {t + 1}"
        assert (a[1] == b[1]).all(), f"seirv diverged at step {t + 1}"
    wp = np.asarray(world.work_perm)
    np.testing.assert_array_equal(
        np.asarray(st_tiny.status_ws), np.asarray(st_tiny.status)[wp]
    )


def test_replicated_in_chunked_run():
    """The chunk runner path (scan + prebuilt statics) agrees with the
    classic formulation end-to-end."""
    from epidemicsimulator_tpu.engine.scan import run

    world = generate_synthetic_world(20000, n_output_areas=12, seed=9)
    params = _mk_params()
    curves = []
    for rep in (True, False):
        cfg = SimConfig(
            max_steps=120, chunk_size=40, use_replicated_orders=rep,
            max_vaccinations_per_step=64, starting_infected=0,
        )
        st = init_state(world, seed=0, starting_infected=0)
        status0 = np.zeros(world.n_citizens, np.int8)
        status0[::97] = STATUS_INFECTED
        st = with_status(st, world, status0)
        _, out = run(world.device_put(), params, cfg, st)
        curves.append((np.asarray(out.seirv), np.asarray(out.exposures_per_oa)))
    np.testing.assert_array_equal(curves[0][0], curves[1][0])
    np.testing.assert_array_equal(curves[0][1], curves[1][1])
