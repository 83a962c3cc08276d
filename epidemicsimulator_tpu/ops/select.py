"""Exact k-th-smallest selection over hash score streams.

The vaccination program needs the exact k-th smallest uint32 score among
the eligible pool every step (engine/fastpath.py §11; simulator.rs:524-553
semantics).  The straightforward bitwise bisection costs 32 masked
reduction passes over the score lane — ~10 ms/step at 63M citizens
(measured, docs/PERF.md).  :func:`kth_threshold` replaces it with a
sampling-accelerated EXACT search:

1. score a strided 1-in-``stride`` sample directly from the hash stream
   (no read of the big lane), sort it, and bound the k-th population score
   between two sample order statistics ``[a, b]`` with a generous margin;
2. one fused pass counts ``eligible & score < a`` and builds the in-band
   mask; the band members are compacted via cumsum ranks + searchsorted
   (ops/sparse.py machinery) into K slots;
3. the answer is the ``(k - count_below_a)``-th smallest of the (tiny)
   band — one K-sized sort.

If the band overflows K, the margin missed (never observed; probability
falls off exponentially in the margin), or the pool is smaller than the
sample can see, a ``lax.cond`` falls back to the 32-pass bisection.
Both paths return the identical exact threshold, so trajectories are
bitwise-independent of which branch ran.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .hashrng import hash_bits

_U32_MAX = np.uint32(0xFFFFFFFF)

#: population sizes below this just run the plain bisection (the sampled
#: machinery needs a meaningful stride to pay off)
MIN_SAMPLED_N = 1 << 22
_SAMPLE_LOG2 = 20  # sample size 1M
_BAND_SLOTS = 8192


def bisect_threshold(scores_u32, eligible, k):
    """Smallest uint32 t with |{eligible & score <= t}| >= k — 32
    compare+reduce passes (the classic form)."""

    def body(state):
        lo, hi, it = state
        mid = lo + (hi - lo) // jnp.uint32(2)
        cnt = jnp.sum((eligible & (scores_u32 <= mid)).astype(jnp.int32))
        hit = cnt >= k
        return (
            jnp.where(hit, lo, mid + jnp.uint32(1)),
            jnp.where(hit, mid, hi),
            it + 1,
        )

    lo, _, _ = jax.lax.while_loop(
        lambda s: s[2] < 32, body, (jnp.uint32(0), _U32_MAX, 0)
    )
    return lo


def kth_threshold(seed_u32, eligible, k, n_eligible, *, use_pallas=False,
                  force_sampled: bool | None = None,
                  sample_log2: int = _SAMPLE_LOG2,
                  band_slots: int = _BAND_SLOTS):
    """Exact k-th smallest of ``hash_bits(seed_u32, arange(n))`` over the
    ``eligible`` pool (k >= 1; returns 0 when k <= 0).

    ``n_eligible`` must equal ``sum(eligible)`` (callers already have it).
    ``force_sampled`` pins the strategy (tests); default: sampled for
    n >= MIN_SAMPLED_N.
    """
    n = eligible.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    scores = hash_bits(seed_u32, idx)
    sampled = n >= MIN_SAMPLED_N if force_sampled is None else force_sampled
    if not sampled:
        return bisect_threshold(scores, eligible, k)

    m = 1 << sample_log2
    stride = n // m  # >= 4 given MIN_SAMPLED_N (tests shrink sample_log2)
    if stride < 1:
        return bisect_threshold(scores, eligible, k)
    sub_idx = jnp.arange(m, dtype=jnp.uint32) * jnp.uint32(stride)
    sub_scores = hash_bits(seed_u32, sub_idx)
    sub_elig = jax.lax.slice(eligible, (0,), (m * stride,), (stride,))
    ssorted = jax.lax.sort(jnp.where(sub_elig, sub_scores, _U32_MAX))
    m_elig = jnp.sum(sub_elig.astype(jnp.int32))

    # expected sample rank of the k-th population score, with a margin of
    # 8 sigma + 32 (binomial tail; generous, and the overflow cond is the
    # real safety net).  f32 ratio math: r < m = 2^20 < 2^24 stays exact
    # enough, and the margin + cond absorb rounding.
    n_el = jnp.maximum(jnp.asarray(n_eligible, jnp.int32), 1)
    ratio = m_elig.astype(jnp.float32) / n_el.astype(jnp.float32)
    r = jnp.floor(jnp.asarray(k, jnp.float32) * ratio).astype(jnp.int32)
    marg = (
        8.0 * jnp.sqrt(jnp.maximum(r.astype(jnp.float32), 1.0)) + 32.0
    ).astype(jnp.int32)
    lo_i = jnp.clip(r - marg, 0, m - 1)
    hi_i = jnp.clip(r + marg, 0, m - 1)
    a = jnp.where(lo_i > 0, ssorted[lo_i], jnp.uint32(0))
    b = ssorted[hi_i]
    # sample exhausted (pool mostly outside the sample's view) → b may
    # be MAX; the band-overflow cond handles it

    below_a = eligible & (scores < a)
    in_band = eligible & (scores >= a) & (scores <= b)
    c_below = jnp.sum(below_a.astype(jnp.int32))

    from .sparse import compact_positions

    pos, live, cnt = compact_positions(in_band, band_slots)
    band = jnp.where(
        live,
        hash_bits(seed_u32, jnp.minimum(pos, n - 1).astype(jnp.uint32)),
        _U32_MAX,
    )
    band_sorted = jax.lax.sort(band)
    j = jnp.asarray(k, jnp.int32) - c_below  # 1-indexed rank inside band
    tau_fast = band_sorted[jnp.clip(j - 1, 0, band.shape[0] - 1)]

    ok = (cnt <= band.shape[0]) & (j >= 1) & (j <= cnt)
    return jax.lax.cond(
        ok,
        lambda _: tau_fast,
        lambda _: bisect_threshold(scores, eligible, k),
        None,
    )
