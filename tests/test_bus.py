"""Bus grouping kernel: route partitioning, capacity-20 chunking, shuffle
uniformity (simulator.rs:360-401 semantics)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from epidemicsimulator_tpu.ops.segments import bus_infection_counts


@functools.lru_cache(maxsize=None)
def _jitted(capacity):
    return jax.jit(
        lambda key, on_bus, route, inf: bus_infection_counts(
            key, on_bus, route, inf, capacity
        )
    )


def _counts(key, on_bus, route, inf, capacity=20):
    return np.asarray(
        _jitted(capacity)(
            jax.random.key(key),
            jnp.asarray(on_bus, bool),
            jnp.asarray(route, jnp.int32),
            jnp.asarray(inf, bool),
        )
    )


def test_all_infected_single_route_chunk_sizes():
    # 45 riders, all infected, one route -> buses of 20/20/5; each rider sees
    # exactly their bus's size as the infected count.
    n = 45
    out = _counts(0, [True] * n, [7] * n, [True] * n)
    vals, cnt = np.unique(out, return_counts=True)
    assert set(vals) == {5, 20}
    assert cnt[vals == 20][0] == 40 and cnt[vals == 5][0] == 5


def test_non_riders_zero():
    on_bus = [True, False, True, False]
    out = _counts(1, on_bus, [3, 3, 3, 3], [True, True, True, True])
    assert out[1] == 0 and out[3] == 0
    assert out[0] == 2 and out[2] == 2  # the two riders share one bus


def test_routes_do_not_mix():
    # 2 routes; route A has the only infected rider.  Route B riders must
    # never see an infected count.
    on_bus = [True] * 30
    route = [1] * 10 + [2] * 20
    inf = [True] + [False] * 29
    for seed in range(5):
        out = _counts(seed, on_bus, route, inf)
        assert (out[10:] == 0).all()
        assert (out[:10] == 1).all()  # 10 riders fit one bus with 1 infected


def test_infected_total_conserved_per_route():
    # Sum over distinct buses of infected counts == total infected riders.
    rng = np.random.default_rng(0)
    n = 200
    on_bus = np.ones(n, bool)
    route = rng.integers(0, 4, n)
    inf = rng.random(n) < 0.3
    out = _counts(3, on_bus, route, inf)
    # For each route, every rider on the same bus reports the same count and
    # bus sizes are <= 20; check per-route aggregate by brute force over seeds
    for r in range(4):
        riders = np.flatnonzero(route == r)
        n_inf = int(inf[riders].sum())
        # average count weighted by bus membership must equal n_inf when
        # summed per bus; do a weaker invariant: max count <= n_inf, and if
        # n_inf > 0 at least one rider sees >= 1.
        assert out[riders].max() <= n_inf
        if n_inf:
            assert out[riders].max() >= 1


def test_shuffle_randomises_bus_composition():
    # 40 riders, 1 infected, one route, capacity 20: the infected lands in
    # bus 0 or bus 1 ~uniformly, so each rider should see n_inf=1 about half
    # the time across seeds.
    n = 40
    inf = [True] + [False] * (n - 1)
    seen = np.zeros(n)
    trials = 200
    for seed in range(trials):
        out = _counts(seed, [True] * n, [0] * n, inf)
        seen += out > 0
    rate = seen[1:] / trials
    # Each susceptible shares the infected's bus w.p. 19/39 ~ 0.487
    assert abs(rate.mean() - 19 / 39) < 0.05
    assert rate.min() > 0.25 and rate.max() < 0.75


def test_bus_hits_matches_infection_counts_distribution():
    """bus_hits (gather-free, sparse-return) produces per-rider hit rates
    consistent with the v1 count formulation under the same parameters."""
    import jax
    import jax.numpy as jnp

    from epidemicsimulator_tpu.ops.maths import binomial_at_least_one
    from epidemicsimulator_tpu.ops.segments import bus_hits

    rng = np.random.default_rng(5)
    r = 4_000
    n_cit = 10_000
    route = np.sort(rng.integers(0, 37, r)).astype(np.int32)
    cit_id = np.sort(rng.choice(n_cit, r, replace=False)).astype(np.int32)
    inf = rng.random(r) < 0.25
    susc = ~inf & (rng.random(r) < 0.9)
    on = rng.random(r) < 0.8
    p_const = 0.4

    def p_fn(compliant, on_bus):
        return jnp.full(compliant.shape, p_const, jnp.float32)

    hits = np.zeros(n_cit, np.int64)
    trials = 60
    for t in range(trials):
        k1, k2 = jax.random.split(jax.random.key(t))
        out = np.asarray(
            bus_hits(
                k1, k2,
                jnp.asarray(on), jnp.asarray(inf), jnp.asarray(susc),
                jnp.asarray(np.ones(r, bool)),
                jnp.asarray(route), jnp.asarray(cit_id),
                20, p_fn, n_cit,
            )[0]
        )
        hits += out
    # riders who are susceptible & riding should be hit at a plausible rate;
    # everyone else never
    mask_riders = np.zeros(n_cit, bool)
    mask_riders[cit_id[on & susc]] = True
    assert hits[~mask_riders].sum() == 0
    rate = hits[mask_riders].mean() / trials
    assert 0.5 < rate < 1.0, rate  # most buses carry >= 1 infected at 25%


def test_bus_hits_dense_fallback_agrees():
    """Force the sparse-return overflow path and compare with max_hits large."""
    import jax
    import jax.numpy as jnp

    from epidemicsimulator_tpu.ops.segments import bus_hits

    rng = np.random.default_rng(9)
    r = 500
    n_cit = 1_000
    route = np.zeros(r, np.int32)
    cit_id = np.arange(0, 2 * r, 2, dtype=np.int32)
    inf = np.zeros(r, bool); inf[:50] = True
    susc = ~inf

    def p_fn(compliant, on_bus):
        return jnp.full(compliant.shape, 1.0, jnp.float32)

    k1, k2 = jax.random.split(jax.random.key(0))
    args = (k1, k2, jnp.asarray(np.ones(r, bool)), jnp.asarray(inf),
            jnp.asarray(susc), jnp.asarray(np.ones(r, bool)),
            jnp.asarray(route), jnp.asarray(cit_id), 20, p_fn, n_cit)
    dense = bus_hits(*args, max_hits=8)      # overflow -> dense
    sparse = bus_hits(*args, max_hits=4096)  # sparse path
    np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(sparse[0]))
    # the rider-order lanes must agree across paths too
    np.testing.assert_array_equal(np.asarray(dense[1]), np.asarray(sparse[1]))
