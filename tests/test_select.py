"""Sampled exact-k threshold (ops/select.py) vs the 32-pass bisection.

Both must return the IDENTICAL uint32 (the k-th smallest eligible hash
score) for any pool shape — the fast path's trajectories must not depend
on which branch ran (engine/fastpath.py §11).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epidemicsimulator_tpu.ops.hashrng import hash_bits
from epidemicsimulator_tpu.ops.select import bisect_threshold, kth_threshold


def _ref_kth(seed, elig, k):
    scores = np.asarray(hash_bits(jnp.uint32(seed),
                                  jnp.arange(elig.shape[0], dtype=jnp.uint32)))
    pool = np.sort(scores[elig])
    return np.uint32(pool[k - 1])


@pytest.mark.parametrize("density", [0.9, 0.1, 0.001])
@pytest.mark.parametrize("k", [1, 37, 1500, 9000])
def test_sampled_matches_bisect(density, k):
    n = 300_000
    rng = np.random.default_rng(hash((density, k)) % 2**32)
    elig = rng.random(n) < density
    n_el = int(elig.sum())
    if k > n_el:
        k = n_el
    seed = 12345

    got_b = int(bisect_threshold(
        hash_bits(jnp.uint32(seed), jnp.arange(n, dtype=jnp.uint32)),
        jnp.asarray(elig), jnp.int32(k)))
    got_s = int(kth_threshold(
        jnp.uint32(seed), jnp.asarray(elig), jnp.int32(k), jnp.int32(n_el),
        force_sampled=True, sample_log2=12, band_slots=512))
    want = int(_ref_kth(seed, elig, k))
    assert got_b == want
    assert got_s == want


def test_tiny_band_falls_back():
    # band_slots too small for the band -> overflow cond -> bisect; result
    # still exact
    n = 200_000
    rng = np.random.default_rng(0)
    elig = rng.random(n) < 0.5
    n_el = int(elig.sum())
    k = 5_000
    got = int(kth_threshold(
        jnp.uint32(7), jnp.asarray(elig), jnp.int32(k), jnp.int32(n_el),
        force_sampled=True, sample_log2=12, band_slots=8))
    assert got == int(_ref_kth(7, elig, k))


def test_k_edges():
    n = 150_000
    elig = np.ones(n, bool)
    for k in [1, n]:
        got = int(kth_threshold(
            jnp.uint32(3), jnp.asarray(elig), jnp.int32(k), jnp.int32(n),
            force_sampled=True, sample_log2=12, band_slots=512))
        assert got == int(_ref_kth(3, elig, k))


def test_jit_under_cond():
    # as used in fastpath: inside jit, k traced
    n = 260_000
    rng = np.random.default_rng(1)
    elig = jnp.asarray(rng.random(n) < 0.3)
    n_el = jnp.sum(elig.astype(jnp.int32))

    @jax.jit
    def f(seed, k):
        return kth_threshold(seed, elig, k, n_el, force_sampled=True,
                             sample_log2=12, band_slots=512)

    for k in [10, 333]:
        want = int(_ref_kth(9, np.asarray(elig), k))
        assert int(f(jnp.uint32(9), jnp.int32(k))) == want


def test_radix_matches_bisect():
    # radix_threshold is the engine's 8-pass form of the 32-pass bisection;
    # identical uint32 on every pool shape, including duplicate scores
    from epidemicsimulator_tpu.ops.select import radix_threshold

    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(10, 50_000))
        scores = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        elig = jnp.asarray(rng.random(n) < max(rng.random(), 0.01))
        n_el = int(jnp.sum(elig))
        if n_el == 0:
            continue
        k = int(rng.integers(1, n_el + 1))
        assert int(radix_threshold(scores, elig, jnp.int32(k))) == int(
            bisect_threshold(scores, elig, jnp.int32(k))
        )
    dup = jnp.asarray(np.array([5, 5, 5, 1, 0xFFFFFFFF, 7] * 100,
                               dtype=np.uint32))
    all_on = jnp.ones(600, bool)
    for k in (1, 2, 100, 300, 599, 600):
        assert int(radix_threshold(dup, all_on, jnp.int32(k))) == int(
            bisect_threshold(dup, all_on, jnp.int32(k))
        )


@pytest.mark.parametrize("force_sampled", [True, False])
@pytest.mark.parametrize("k", [1, 129, 6000])
def test_sharded_kth_matches_oracle(force_sampled, k):
    """kth_threshold_sharded under shard_map on the 8-device CPU mesh must
    return the exact GLOBAL k-th smallest eligible score on every shard —
    both selector branches (sampled band / psum bisection)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from epidemicsimulator_tpu.ops.select import kth_threshold_sharded
    from epidemicsimulator_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n_dev, S = 8, 8192
    n = n_dev * S
    rng = np.random.default_rng(k)
    elig = rng.random(n) < 0.4
    n_el = int(elig.sum())
    kk = min(k, n_el)
    seed = 4242
    scores = hash_bits(jnp.uint32(seed), jnp.arange(n, dtype=jnp.uint32))
    mesh = make_mesh(8)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P("pop"), P("pop")),
             out_specs=P("pop"), check_vma=False)
    def run(sc, el):
        tau = kth_threshold_sharded(
            sc, el, jnp.int32(kk), jnp.int32(n_el), axis="pop",
            force_sampled=force_sampled, sample_log2=8, band_slots=1024,
        )
        return jnp.full((S,), tau)

    taus = np.asarray(run(scores, jnp.asarray(elig)))
    want = np.sort(np.asarray(scores)[elig])[kk - 1]
    assert (taus == want).all(), f"{np.unique(taus)} != {want}"


def test_sharded_kth_band_overflow_falls_back():
    """Overflowing per-shard band slots must trip the replicated fallback
    cond and still return the exact answer."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from epidemicsimulator_tpu.ops.select import kth_threshold_sharded
    from epidemicsimulator_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n_dev, S = 8, 8192
    n = n_dev * S
    rng = np.random.default_rng(1)
    elig = rng.random(n) < 0.9
    n_el = int(elig.sum())
    kk = 20_000
    seed = 99
    scores = hash_bits(jnp.uint32(seed), jnp.arange(n, dtype=jnp.uint32))
    mesh = make_mesh(8)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P("pop"), P("pop")),
             out_specs=P("pop"), check_vma=False)
    def run(sc, el):
        tau = kth_threshold_sharded(
            sc, el, jnp.int32(kk), jnp.int32(n_el), axis="pop",
            force_sampled=True, sample_log2=4, band_slots=8,
        )
        return jnp.full((S,), tau)

    taus = np.asarray(run(scores, jnp.asarray(elig)))
    want = np.sort(np.asarray(scores)[elig])[kk - 1]
    assert (taus == want).all()
