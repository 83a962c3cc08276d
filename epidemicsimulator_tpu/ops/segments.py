"""Segment reductions and the per-step bus grouping kernel.

The reference's exposure machinery walks per-building occupant lists behind
mutexes (simulator.rs:262-405).  On TPU the same semantics are one
``segment_sum`` per mixing-group namespace plus gathers — shape-stable,
fully vectorised, and fusable by XLA.

The hard case is public transport: the reference *shuffles* each route's
riders and chunks them into capacity-20 buses every step
(simulator.rs:360-401, public_transport_route.rs:78-87).  We express that as
a key-sort: sort riders by (route, random tiebreak); a random tiebreak within
equal route keys IS a uniform shuffle of that route's riders; contiguous
chunks of 20 in sorted order are then exactly the reference's buses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .maths import binomial_at_least_one

# NOTE: keep this a Python int, NOT a jnp scalar: module-level device
# constants get hoisted as hidden executable inputs by the jax-0.9 constant
# system and the axon dispatch drops them ("supplied N buffers, expected
# N+2") once more than one executable exists.
_INT32_MAX = 2**31 - 1


def count_per_segment(values, segment_ids, num_segments: int):
    """segment_sum with int32 accumulation."""
    return jax.ops.segment_sum(
        jnp.asarray(values, jnp.int32), segment_ids, num_segments=num_segments
    )


def bus_infection_counts(key, on_bus, route_key, infected, capacity: int):
    """Assign riders to buses and return per-citizen infected-on-my-bus counts.

    Parameters
    ----------
    key: PRNG key for this step's shuffle.
    on_bus: (N,) bool — riding this step.
    route_key: (N,) int32 — dense (src_oa, dst_oa) route id; ignored for
        non-riders.
    infected: (N,) bool — rider is infected (contributes exposure on the bus).
    capacity: bus capacity (static; config.rs:37 = 20).

    Returns
    -------
    n_inf_my_bus: (N,) int32 — number of infected riders sharing the citizen's
        bus this step (0 for non-riders).

    Semantics matched to the reference: riders of one (src, dst) route are
    shuffled uniformly (simulator.rs:362) and packed into buses of exactly
    ``capacity`` with one trailing partial bus (public_transport_route.rs:79).
    Exposure strength on a bus is its total infected count
    (simulator.rs:385-387), evaluated per rider later.
    """
    n = on_bus.shape[0]
    rk = jnp.where(on_bus, route_key, _INT32_MAX)
    # Random minor key: equal-route riders land in uniformly random relative
    # order == the reference's Vec::shuffle.
    tiebreak = jax.random.bits(key, (n,), dtype=jnp.uint32).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    rk_s, _, idx_s = jax.lax.sort((rk, tiebreak, idx), num_keys=2)

    inf_s = jnp.take(infected, idx_s).astype(jnp.int32)

    # Route-run starts in sorted order -> position within route -> bus id.
    boundary = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), rk_s[1:] != rk_s[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(boundary, idx, 0))
    pos_in_route = idx - seg_start
    # Each bus is identified by the sorted index of its first rider.
    bus_first = seg_start + (pos_in_route // capacity) * capacity

    n_inf_bus = jax.ops.segment_sum(inf_s, bus_first, num_segments=n)
    n_my_bus = jnp.take(n_inf_bus, bus_first)
    valid = rk_s != _INT32_MAX
    n_my_bus = jnp.where(valid, n_my_bus, 0)

    # Scatter back to citizen order.
    out = jnp.zeros((n,), jnp.int32).at[idx_s].set(n_my_bus, mode="drop")
    return out


def bus_exposure_probability(p_exposure, n_inf_my_bus):
    """Per-rider probability of exposure on their bus.

    ``Citizen::expose`` with ``exposure_total = bus.exposure_count``
    (simulator.rs:385-400): binomial(p, n) with at-least-one-success form.
    n <= capacity = 20, so the u8 truncation (citizen.rs:239) cannot trigger.
    """
    return jnp.where(
        n_inf_my_bus > 0,
        binomial_at_least_one(p_exposure, n_inf_my_bus),
        0.0,
    )
