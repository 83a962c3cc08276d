"""Fused Pallas run-total kernels vs the XLA reference (ops/runsums.py).

Runs in Pallas interpreter mode on the CPU test platform; the TPU
compilation path is exercised by tools/bench_pallas_scans.py and the
headline bench.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from epidemicsimulator_tpu.ops.pallas_scans import run_totals_fused
from epidemicsimulator_tpu.ops.runsums import run_totals


def _random_runs(rng, n, avg_run):
    """Random contiguous partition of [0, n) -> start/end masks."""
    starts = np.zeros(n, bool)
    ends = np.zeros(n, bool)
    i = 0
    while i < n:
        ln = max(1, int(rng.poisson(avg_run)))
        j = min(n, i + ln)
        starts[i] = True
        ends[j - 1] = True
        i = j
    return starts, ends


@pytest.mark.parametrize("n", [96, 128, 1024, 4096, 70_000])
def test_single_set_matches_reference(n):
    rng = np.random.default_rng(n)
    v = (rng.random(n) < 0.2).astype(np.int8)
    starts, ends = _random_runs(rng, n, avg_run=4)
    ref = run_totals(jnp.asarray(v), jnp.asarray(starts), jnp.asarray(ends))
    (got,) = run_totals_fused(
        jnp.asarray(v), [(jnp.asarray(starts), jnp.asarray(ends))],
        tile_rows=8, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_dual_set_shares_values():
    """Two nested boundary structures over one values lane (the work side's
    building + room structure)."""
    rng = np.random.default_rng(7)
    n = 9_000
    v = (rng.random(n) < 0.3).astype(np.int8)
    coarse = _random_runs(rng, n, avg_run=60)
    # fine runs nested inside coarse ones: room boundaries include every
    # building boundary
    fs, fe = _random_runs(rng, n, avg_run=9)
    fs |= coarse[0]
    fe |= coarse[1]
    # realign: every end must be followed by a start
    fs[1:] |= fe[:-1]
    fe[:-1] |= fs[1:]

    ref_c = run_totals(jnp.asarray(v), jnp.asarray(coarse[0]), jnp.asarray(coarse[1]))
    ref_f = run_totals(jnp.asarray(v), jnp.asarray(fs), jnp.asarray(fe))
    got_c, got_f = run_totals_fused(
        jnp.asarray(v),
        [
            (jnp.asarray(coarse[0]), jnp.asarray(coarse[1])),
            (jnp.asarray(fs), jnp.asarray(fe)),
        ],
        tile_rows=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(ref_f))


def test_all_zero_and_all_one_values():
    n = 2_000
    starts = np.zeros(n, bool)
    ends = np.zeros(n, bool)
    starts[0] = True
    ends[-1] = True  # one giant run
    for v in (np.zeros(n, np.int8), np.ones(n, np.int8)):
        ref = run_totals(jnp.asarray(v), jnp.asarray(starts), jnp.asarray(ends))
        (got,) = run_totals_fused(
            jnp.asarray(v), [(jnp.asarray(starts), jnp.asarray(ends))],
            tile_rows=2, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_singleton_runs():
    n = 1_111
    rng = np.random.default_rng(3)
    v = rng.integers(0, 3, n).astype(np.int8)
    starts = np.ones(n, bool)
    ends = np.ones(n, bool)
    (got,) = run_totals_fused(
        jnp.asarray(v), [(jnp.asarray(starts), jnp.asarray(ends))],
        tile_rows=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), v.astype(np.int32))


def test_fastpath_with_pallas_scans_matches_xla_bitwise():
    """The fused kernel feeds the same integer counts into the same RNG
    stream, so whole fast-path trajectories must agree bitwise."""
    import dataclasses

    import jax

    from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
    from epidemicsimulator_tpu.engine.state import init_state
    from epidemicsimulator_tpu.engine.step import step

    world = generate_synthetic_world(2500, n_output_areas=5, seed=9)
    params = Params.covid().as_arrays()
    trajs = []
    for pallas in (True, False):
        cfg = SimConfig(use_pallas_scans=pallas, max_vaccinations_per_step=32)
        st = init_state(world, seed=3, starting_infected=40)
        wd = world.device_put()
        jstep = jax.jit(lambda w, p, s: step(w, p, cfg, s))
        rows = []
        for _ in range(40):
            st, out = jstep(wd, params, st)
            rows.append((np.asarray(st.status).copy(), np.asarray(out.seirv).copy()))
        trajs.append(rows)
    for t, (a, b) in enumerate(zip(*trajs)):
        assert (a[0] == b[0]).all(), f"status diverged at step {t + 1}"
        assert (a[1] == b[1]).all(), f"seirv diverged at step {t + 1}"


@pytest.mark.parametrize("n", [50, 128, 131_072, 200_000])
def test_cumsum_pallas(n):
    from epidemicsimulator_tpu.ops.pallas_scans import cumsum_pallas

    rng = np.random.default_rng(n)
    v = (rng.random(n) < 0.3).astype(np.int8)
    got = np.asarray(cumsum_pallas(jnp.asarray(v), tile_rows=8, interpret=True))
    np.testing.assert_array_equal(got, np.cumsum(v).astype(np.int32))


def test_range_totals_pallas():
    from epidemicsimulator_tpu.ops.pallas_scans import range_totals_pallas
    from epidemicsimulator_tpu.ops.runsums import range_totals

    rng = np.random.default_rng(1)
    n = 33_000
    v = (rng.random(n) < 0.4).astype(np.int8)
    cuts = np.sort(rng.choice(n, 40, replace=False))
    lo = np.r_[0, cuts].astype(np.int32)
    hi = np.r_[cuts, n].astype(np.int32)
    ref = range_totals(jnp.asarray(v), jnp.asarray(lo), jnp.asarray(hi))
    got = range_totals_pallas(
        jnp.asarray(v), jnp.asarray(lo), jnp.asarray(hi),
        tile_rows=8, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
