"""Sparse cross-order transport: move a few set bits between citizen order,
work order and rider order without N-sized sorts.

The replicated-order fast path (engine/fastpath.py) maintains disease state
in three static orders and communicates only the per-step *changes* (new
exposures, vaccinations, work-side hits) — typically tens to a few thousand
elements out of millions.  TPU scatters cost per *update* element and
gathers per *query* element, so a K-bounded transport is:

    rank  = inclusive cumsum of the hit mask          (one Pallas pass)
    pos_j = searchsorted(rank, j+1)  for j < K         (~log2(N) gather rounds
                                                        of K elements)
    scatter the <=K positions through a static permutation lane

Overflow (count > K) falls back to the dense permutation sort at the call
site — never wrong, just slower, and only big-epidemic peaks hit it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_ranks(mask, *, use_pallas: bool):
    """Inclusive-cumsum ranks of a bool lane and the total count."""
    if use_pallas:
        from .pallas_scans import cumsum_pallas

        rank = cumsum_pallas(mask)
    else:
        rank = jnp.cumsum(mask.astype(jnp.int32))
    n = mask.shape[0]
    return rank, rank[n - 1]


def compact_from_ranks(rank, count, k_slots: int):
    """Positions of the first ``k_slots`` set bits given inclusive ranks.

    Returns ``(pos, live)``: ``pos[j]`` is the index of the (j+1)-th set bit
    (== N for j >= count), ``live[j] = j < count``.  Exact for
    ``count <= k_slots``; callers must branch to a dense path otherwise.
    """
    tgt = jnp.arange(1, k_slots + 1, dtype=jnp.int32)
    pos = jnp.searchsorted(rank, tgt, side="left").astype(jnp.int32)
    live = tgt <= count
    return pos, live


def scatter_bits(n_out: int, dest_idx, live):
    """(n_out,) bool lane with ``dest_idx[live]`` set (K-sized updates)."""
    return (
        jnp.zeros((n_out,), bool)
        .at[jnp.where(live, dest_idx, n_out)]
        .set(True, mode="drop")
    )
