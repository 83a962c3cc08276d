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


def compact_positions(mask, k_slots: int, *, block: int = 1024):
    """Positions of the first ``k_slots`` set bits of ``mask`` — WITHOUT an
    N-sized cumsum.

    The rank machinery above pays one full-lane cumsum (~4.8 ms at 63M on
    this chip, docs/PERF.md) plus a searchsorted over the N-lane.  This
    form is hierarchical and pure XLA:

      1. per-block counts via one reshape-reduce (bandwidth pass),
      2. tiny cross-block prefix,
      3. per-slot block via searchsorted over the (N/block,) prefix,
      4. row-gather of the K owning blocks, local per-row cumsum,
      5. within-row searchsorted for the residual rank.

    Returns ``(pos, live, total)``: ``pos[j]`` = index of the (j+1)-th set
    bit (== N for dead slots), ``live[j] = j < total``, ``total`` = exact
    popcount.  Exact while ``total <= k_slots`` — callers branch to dense
    paths past that.  Bitwise-identical to ``mask_ranks`` +
    :func:`compact_from_ranks`.
    """
    n = mask.shape[0]
    k_slots = min(k_slots, n)  # tiny worlds (and vmapped tests) must not
    # blow the (k_slots, block) intermediates past the data itself
    nb = -(-n // block)
    pad = nb * block - n
    m = mask.astype(jnp.int8)
    if pad:
        m = jnp.concatenate([m, jnp.zeros((pad,), jnp.int8)])
    m2 = m.reshape(nb, block)
    bs = m2.astype(jnp.int32).sum(axis=1)
    bp = jnp.cumsum(bs)
    total = bp[nb - 1]

    tgt = jnp.arange(1, k_slots + 1, dtype=jnp.int32)
    blk = jnp.searchsorted(bp, tgt, side="left").astype(jnp.int32)
    blk_safe = jnp.minimum(blk, nb - 1)
    prior = jnp.take(bp, blk_safe) - jnp.take(bs, blk_safe)
    resid = tgt - prior  # 1-indexed rank within the owning block

    rows = jnp.take(m2, blk_safe, axis=0)  # (K, block) row gather
    local = jnp.cumsum(rows.astype(jnp.int32), axis=1)
    # index of first local >= resid == count of (local < resid): one
    # vectorized compare+reduce instead of a batched searchsorted loop
    within = (local < resid[:, None]).sum(axis=1).astype(jnp.int32)

    live = tgt <= total
    pos = jnp.where(live, blk_safe * block + within, n).astype(jnp.int32)
    return pos, live, total
