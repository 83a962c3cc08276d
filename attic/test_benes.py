"""Benes static-permutation replay (ops/benes.py) vs direct indexing."""

import numpy as np
import pytest

from epidemicsimulator_tpu.ops.benes import (
    benes_distances,
    benes_permute,
    route_permutation,
)


@pytest.mark.parametrize("n", [2, 5, 128, 1000, 4096, 100_003])
def test_benes_matches_indexing(n):
    rng = np.random.default_rng(n)
    src = rng.permutation(n).astype(np.int32)
    ctrl, k = route_permutation(src)
    assert ctrl.shape[0] == (2 * k - 1 + 7) // 8
    payload = rng.integers(-128, 128, n).astype(np.int8)

    out = np.asarray(benes_permute(payload, ctrl, k))
    np.testing.assert_array_equal(out, payload[src])

    inv = np.empty(n, np.int64)
    inv[src] = np.arange(n)
    out_r = np.asarray(benes_permute(payload, ctrl, k, reverse=True))
    np.testing.assert_array_equal(out_r, payload[inv])


def test_benes_matches_permute_by_sort():
    """Same contract as the hot loop's packed-sort move: ws[wpos[i]] = x[i]
    == gather by the inverse (work_perm) == reverse replay of wpos... and
    the forward replay of a rank lane equals permute_by_sort on it."""
    import jax.numpy as jnp

    from epidemicsimulator_tpu.ops.runsums import permute_by_sort

    rng = np.random.default_rng(7)
    n = 20_000
    rank = rng.permutation(n).astype(np.int32)  # citizen i -> slot rank[i]
    x = rng.integers(0, 32, n).astype(np.int8)
    want = np.asarray(permute_by_sort(jnp.asarray(rank), jnp.asarray(x), bits=5))

    # permute_by_sort(rank, x)[j] = x[argsort(rank)[j]] — i.e. gather by
    # the inverse permutation of rank.  Route rank as src and replay in
    # REVERSE to apply its inverse.
    ctrl, k = route_permutation(rank)
    got = np.asarray(benes_permute(x, ctrl, k, reverse=True))
    np.testing.assert_array_equal(got, want)

    inv = np.argsort(rank).astype(np.int32)
    ctrl2, k2 = route_permutation(inv.astype(np.int32))
    got2 = np.asarray(benes_permute(x, ctrl2, k2))
    np.testing.assert_array_equal(got2, want)


def test_distances_shape():
    assert benes_distances(3) == (4, 2, 1, 2, 4)
    assert len(benes_distances(22)) == 43
