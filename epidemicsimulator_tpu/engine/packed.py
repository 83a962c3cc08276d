"""Packed-replica ensembles: R parameter replicates as ONE world.

The vmapped ensemble (engine/ensemble.py) pays ~3.4x over a single world of
the same total lane count (docs/PERF.md): batched sorts, flattened control
flow and per-replicate small-op overhead.  This module removes the vmap
entirely — R disjoint copies of the base world are packed into one World
(buildings / OAs / rooms / routes offset per replica, so no mixing group
ever crosses replicas) and ONE pass of the regular fast-path formulation
steps all replicates:

* swept disease parameters (exposure_chance, exposed_time, infected_time)
  become static per-citizen lanes (+ work-order and rider-order copies);
* intervention state (lockdown, mask status, vaccination started) is an
  (R,) vector; per-citizen views are broadcast+reshape — replicas are
  contiguous, equal-size blocks in every engine order, so no gather;
* the per-replicate SEIRV census is a row reduction of status.reshape(R,n);
* exact-k vaccination runs the usual kth-score-threshold search vmapped
  over the (R, n) reshape.

Replicates are independent simulations: the packed trajectory of replica r
is distributionally identical to a solo run (draws hash global indices, so
streams differ from solo runs, like any reseeding).

Same sweep surface as engine/ensemble.py::run_ensemble; returns (R, T, 5).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    MASK_EVERYWHERE,
    MASK_NONE,
    MASK_PUBLIC_TRANSPORT,
    STATUS_EXPOSED,
    STATUS_INFECTED,
    STATUS_SUSCEPTIBLE,
    STATUS_VACCINATED,
    Params,
    SimConfig,
)
from ..ops.hashrng import hash_bits, hash_uniform
from ..ops.maths import binomial_at_least_one, truncate_u8
from ..ops.runsums import permute_by_sort, run_totals
from ..ops.segments import bus_hits
from ..world.schema import World, make_world
from .fastpath import (
    _advance_disease, _exposure_p, _kth_score_threshold, _movement,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedEnsemble:
    """One world holding R replicas + per-replica parameter lanes."""

    world: World
    # swept per-citizen parameter lanes (citizen order)
    chance: Any          # f32 (N,)
    exposed_time: Any    # i32 (N,)
    infected_time: Any   # i32 (N,)
    # order copies of the chance lane
    chance_ws: Any       # f32 (N,), work order
    chance_r: Any        # f32 (R_riders,), rider order
    # shared scalars
    mask_effectiveness: Any  # f32
    vaccination_rate: Any    # i32
    n_replicas: int = dataclasses.field(metadata=dict(static=True))
    rep_size: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedState:
    status: Any          # i8 (N,)
    timer: Any           # i32 (N,)
    at_work: Any         # bool (N,)
    on_bus: Any          # bool (N,)
    at_work_ws: Any      # bool (N,), movement twin in work order
    on_bus_ws: Any       # bool (N,)
    eligible: Any        # bool (N,)
    hour: Any            # i32
    lockdown: Any        # bool (R,)
    mask_status: Any     # i8 (R,)
    vaccination_started: Any  # bool (R,)
    rng_key: Any


def pack_replicas(base: World, param_list: list[Params]) -> PackedEnsemble:
    """Tile ``base`` into R offset replicas and bake the swept parameters
    into per-citizen lanes.  Replicas stay contiguous, equal-size blocks in
    citizen, work and rider order (buildings/OAs/rooms are replica-major,
    and make_world's canonicalisation preserves replica-major keys)."""
    R = len(param_list)
    n = base.n_citizens
    B, M, O = base.n_buildings, base.n_rooms, base.n_output_areas

    def tiled(x):
        return np.tile(np.asarray(x), R)

    rep = np.repeat(np.arange(R, dtype=np.int64), n)
    rm = np.asarray(base.room, np.int64)
    room_packed = np.where(
        np.tile(rm, R) == M, R * M, rep * M + np.tile(rm, R)
    )
    world = make_world(
        age=tiled(base.age),
        occupation=tiled(base.occupation),
        home_building=rep * B + tiled(base.home_building),
        work_building=rep * B + tiled(base.work_building),
        home_oa=rep * O + tiled(base.home_oa),
        work_oa=rep * O + tiled(base.work_oa),
        room=room_packed,
        is_school_work=tiled(base.is_school_work),
        uses_transport=tiled(base.uses_transport),
        mask_compliant=tiled(base.mask_compliant),
        work_start=tiled(base.work_start),
        work_end=tiled(base.work_end),
        n_buildings=R * B,
        n_rooms=R * M,
        n_output_areas=R * O,
    )
    # make_world must not have reordered citizens across replicas: the
    # packed home_building keys are already sorted replica-major.
    assert world.n_citizens == R * n

    ds = [p.as_arrays().disease for p in param_list]
    chance = np.repeat(
        np.array([float(jax.device_get(d.exposure_chance)) for d in ds],
                 np.float32), n)
    et = np.repeat(
        np.array([int(jax.device_get(d.exposed_time)) for d in ds],
                 np.int32), n)
    it = np.repeat(
        np.array([int(jax.device_get(d.infected_time)) for d in ds],
                 np.int32), n)
    wp = np.asarray(world.work_perm)
    rp = np.asarray(world.rider_perm)
    return PackedEnsemble(
        world=world,
        chance=chance,
        exposed_time=et,
        infected_time=it,
        chance_ws=chance[wp],
        chance_r=chance[rp],
        mask_effectiveness=np.float32(
            jax.device_get(ds[0].mask_effectiveness)),
        vaccination_rate=np.int32(jax.device_get(ds[0].vaccination_rate)),
        n_replicas=R,
        rep_size=n,
    )


def init_packed_state(pe: PackedEnsemble, *, seed: int = 0,
                      starting_infected: int = 10) -> PackedState:
    """Seed ``starting_infected`` infections independently per replica."""
    R, n = pe.n_replicas, pe.rep_size
    rng = np.random.default_rng(seed)
    status = np.zeros(R * n, np.int8)
    for r in range(R):
        idx = rng.choice(n, size=starting_infected, replace=False)
        status[r * n + idx] = STATUS_INFECTED
    return PackedState(
        status=jnp.asarray(status),
        timer=jnp.zeros(R * n, jnp.int32),
        at_work=jnp.zeros(R * n, bool),
        on_bus=jnp.zeros(R * n, bool),
        at_work_ws=jnp.zeros(R * n, bool),
        on_bus_ws=jnp.zeros(R * n, bool),
        eligible=jnp.zeros(R * n, bool),
        hour=jnp.int32(0),
        lockdown=jnp.zeros(R, bool),
        mask_status=jnp.full(R, MASK_NONE, jnp.int8),
        vaccination_started=jnp.zeros(R, bool),
        rng_key=jax.random.PRNGKey(seed),
    )


def _rep_lane(vec_r, R, n):
    """(R,) per-replica vector -> (R*n,) per-citizen lane (no gather:
    replicas are contiguous equal blocks)."""
    return jnp.broadcast_to(vec_r[:, None], (R, n)).reshape(-1)


def packed_step(pe: PackedEnsemble, th, cfg: SimConfig, state: PackedState):
    """One hour for all R replicas.  Reference semantics per replica
    (simulator.rs:131-152); th = InterventionThresholds (shared)."""
    world = pe.world
    R, n = pe.n_replicas, pe.rep_size
    N = R * n

    hour = state.hour + 1
    key = jax.random.fold_in(state.rng_key, hour)
    k_bus, k_h, k_w, k_b, k_vax = jax.random.split(key, 5)
    seed_h = jax.random.bits(k_h, (), jnp.uint32)
    seed_w = jax.random.bits(k_w, (), jnp.uint32)
    seed_vax = jax.random.bits(k_vax, (), jnp.uint32)
    h24 = (hour % 24).astype(jnp.int8)

    # 1. timers (per-replica exposed/infected time lanes)
    class _D:
        exposed_time = pe.exposed_time
        infected_time = pe.infected_time

    status, timer = _advance_disease(state.status, state.timer, _D)

    # 2. movement; lockdown is per replica
    move = ~_rep_lane(state.lockdown, R, n)
    at_work, on_bus, _ = _movement(
        h24, world.work_start, world.work_end, world.uses_transport,
        move, state.at_work, state.on_bus, None,
    )

    # 3. per-replica census, post-advance (simulator.rs:178)
    st2 = status.reshape(R, n)
    seirv0 = jnp.stack(
        [jnp.sum((st2 == s).astype(jnp.int32), axis=1) for s in range(5)],
        axis=1,
    )  # (R, 5)

    def trunc(x):
        return truncate_u8(x) if cfg.reference_u8_truncation else x

    # 4. home side
    inf_active = (status == STATUS_INFECTED) & ~on_bus
    wneq = world.work_building != world.home_building
    contrib_home = inf_active & (~at_work | ~wneq)
    K = world.max_household_size
    if 0 < K <= 24:
        c8 = contrib_home.astype(jnp.int8)
        pos, size = world.hh_pos, world.hh_size
        acc = contrib_home.astype(jnp.int32)
        for dd in range(1, K):
            acc = acc + jnp.where(pos + dd < size, jnp.roll(c8, -dd), 0)
            acc = acc + jnp.where(pos - dd >= 0, jnp.roll(c8, dd), 0)
        n_h = acc
    else:
        n_h = run_totals(
            contrib_home, world.home_start_mask, world.home_end_mask
        )
    ms_cit = _rep_lane(state.mask_status, R, n)
    p_cit = _exposure_p(
        pe.chance, pe.mask_effectiveness, ms_cit,
        world.mask_compliant, on_bus, cfg.reference_mask_semantics,
    )
    cur_oa = jnp.where(at_work, world.work_oa, world.home_oa)
    q_home = jnp.where(
        cur_oa == world.home_oa, binomial_at_least_one(p_cit, trunc(n_h)), 0.0
    )
    susceptible = status == STATUS_SUSCEPTIBLE
    hit_home = susceptible & (
        hash_uniform(seed_h, jnp.arange(N, dtype=jnp.uint32)) < q_home
    )

    # 5-7. work side.  Gated like the fastpath (fastpath.py work_pred):
    # when no infected worker is at a workplace, every q is 0 and no hit
    # can fire — the zero branch is value-identical and skips the two
    # N-sized permutation sorts + run-totals (the dominant step cost).
    contrib_work = inf_active & at_work & wneq
    # ws-order movement twin, stepped natively every hour (carried state;
    # same rules + per-replica move lane: ws order is replica-major equal
    # blocks, so the citizen-order broadcast lane is also the ws-order one)
    at_work_ws, on_bus_ws, _ = _movement(
        h24, world.ws_work_start, world.ws_work_end, world.ws_uses_transport,
        move, state.at_work_ws, state.on_bus_ws, None,
    )

    use_pallas = cfg.use_pallas_scans
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def work_side(fwd):
        fwd_ws = permute_by_sort(world.wpos, fwd, bits=3)
        contrib_w_ws = (fwd_ws & 1).astype(jnp.int32)
        susc_ws = (fwd_ws & 2) != 0
        hit_home_ws = (fwd_ws & 4) != 0
        if use_pallas:
            from ..ops.pallas_scans import run_totals_fused

            n_w_ws, room_ws = run_totals_fused(
                (fwd_ws & 1),
                [
                    (world.ws_wb_start_mask, world.ws_wb_end_mask),
                    (world.ws_room_start_mask, world.ws_room_end_mask),
                ],
                tile_rows=512,
            )
        else:
            n_w_ws = run_totals(
                contrib_w_ws, world.ws_wb_start_mask, world.ws_wb_end_mask
            )
            room_ws = run_totals(
                contrib_w_ws, world.ws_room_start_mask, world.ws_room_end_mask
            )
        draws_ws = jnp.where(
            world.ws_is_school, room_ws, (n_w_ws > 0).astype(jnp.int32)
        )
        p_ws = _exposure_p(
            pe.chance_ws, pe.mask_effectiveness, ms_cit,
            world.ws_mask_compliant, on_bus_ws, cfg.reference_mask_semantics,
        )
        cur_oa_ws = jnp.where(at_work_ws, world.ws_work_oa, world.ws_home_oa)
        q_single = binomial_at_least_one(p_ws, trunc(n_w_ws))
        q_work_ws = jnp.where(
            (cur_oa_ws == world.ws_work_oa) & world.ws_work_neq_home,
            -jnp.expm1(draws_ws.astype(jnp.float32) * jnp.log1p(-q_single)),
            0.0,
        )
        u_w = hash_uniform(seed_w, jnp.arange(N, dtype=jnp.uint32))
        hit_work_ws = susc_ws & ~hit_home_ws & (u_w < q_work_ws)
        return permute_by_sort(
            world.work_perm, hit_work_ws.astype(jnp.int8), bits=1
        ).astype(bool)

    fwd = (
        contrib_work.astype(jnp.int8)
        | (susceptible.astype(jnp.int8) << 1)
        | (hit_home.astype(jnp.int8) << 2)
    )
    hit_work = jax.lax.cond(
        jnp.any(contrib_work),
        work_side,
        lambda _: jnp.zeros((N,), bool),
        fwd,
    )

    # 8. bus side: rider-order bits via the rpos packed sort (no gather);
    #    per-rider mask-adjusted chance rides the shuffle sort.  Gated like
    #    the fastpath (bus_pred): no infected rider -> n_bus=0 -> q=0
    #    everywhere, so the zero branch is value-identical.
    rp = world.rider_perm
    R_riders = rp.shape[0]
    r_base = R_riders // R

    def bus_side(rider_bits):
        rb = permute_by_sort(world.rpos, rider_bits, bits=3)[:R_riders]
        rb_on = (rb & 1) != 0
        rb_inf = (rb & 2) != 0
        rb_susc = (rb & 4) != 0
        # rider order is replica-major with equal blocks (same base riders)
        ms_r = jnp.broadcast_to(
            state.mask_status[:, None], (R, r_base)
        ).reshape(-1)
        compliant_r = world.rider_mask_compliant
        if cfg.reference_mask_semantics:
            active_r = (ms_r == MASK_EVERYWHERE) & ~compliant_r
        else:
            active_r = compliant_r & (
                (ms_r == MASK_EVERYWHERE)
                | ((ms_r == MASK_PUBLIC_TRANSPORT) & rb_on)
            )
        rb_chance = jnp.asarray(
            pe.chance_r
            * jnp.where(active_r, 1.0 - pe.mask_effectiveness, 1.0),
            jnp.float32,
        )
        return bus_hits(
            k_bus, k_b, rb_on, rb_inf, rb_susc, compliant_r,
            world.rider_route, rp, cfg.bus_capacity,
            lambda c, v, chance: chance, N,
            rb_chance=rb_chance,
        )[0]

    rider_bits = (
        on_bus.astype(jnp.int8)
        | ((status == STATUS_INFECTED).astype(jnp.int8) << 1)
        | (susceptible.astype(jnp.int8) << 2)
    )
    hit_bus = jax.lax.cond(
        jnp.any(on_bus & (status == STATUS_INFECTED)),
        bus_side,
        lambda _: jnp.zeros((N,), bool),
        rider_bits,
    )

    # 9. combine
    newly_exposed = hit_home | hit_work | hit_bus
    status = jnp.where(newly_exposed, jnp.int8(STATUS_EXPOSED), status)
    timer = jnp.where(newly_exposed, 0, timer)
    from_bus = hit_bus & ~hit_home & ~hit_work
    if cfg.faithful_vaccine_bugs:
        eligible = state.eligible & ~from_bus
    else:
        eligible = state.eligible & ~newly_exposed

    n_new_r = jnp.sum(newly_exposed.reshape(R, n).astype(jnp.int32), axis=1)
    seirv = (
        seirv0.at[:, STATUS_SUSCEPTIBLE].add(-n_new_r)
        .at[:, STATUS_EXPOSED].add(n_new_r)
    )

    # 10. interventions per replica (interventions.rs:110-184)
    pct = seirv[:, STATUS_INFECTED].astype(jnp.float32) / jnp.float32(n)
    lockdown = (th.lockdown >= 0) & (th.lockdown < pct)
    newly_started = (
        ~state.vaccination_started
        & (th.vaccination >= 0) & (th.vaccination < pct)
    )
    vaccination_started = state.vaccination_started | newly_started
    eligible = jnp.where(
        _rep_lane(newly_started, R, n), status == STATUS_SUSCEPTIBLE, eligible
    )
    ms = state.mask_status
    ms_next = jnp.where(
        ms == MASK_NONE,
        jnp.where(pct > th.mask_public_transport, MASK_PUBLIC_TRANSPORT,
                  MASK_NONE),
        jnp.where(
            ms == MASK_PUBLIC_TRANSPORT,
            jnp.where(
                pct < th.mask_public_transport, MASK_NONE,
                jnp.where(pct > th.mask_everywhere, MASK_EVERYWHERE,
                          MASK_PUBLIC_TRANSPORT),
            ),
            jnp.where(pct < th.mask_everywhere, MASK_PUBLIC_TRANSPORT,
                      MASK_EVERYWHERE),
        ),
    ).astype(jnp.int8)

    # 11. vaccination: exact-k per replica (simulator.rs:524-553), gated on
    #     any replica having started
    def vaccinate(args):
        status, eligible = args
        scores = hash_bits(
            seed_vax, jnp.arange(N, dtype=jnp.uint32)
        ).reshape(R, n)
        elig2 = eligible.reshape(R, n)
        started = vaccination_started
        k_r = jnp.where(
            started,
            jnp.minimum(
                jnp.asarray(pe.vaccination_rate, jnp.int32),
                jnp.sum(elig2.astype(jnp.int32), axis=1),
            ),
            0,
        )
        tau = jax.vmap(_kth_score_threshold)(scores, elig2, k_r)
        below = elig2 & (scores < tau[:, None])
        at = elig2 & (scores == tau[:, None])
        allowed = k_r - jnp.sum(below.astype(jnp.int32), axis=1)
        at_rank = jnp.cumsum(at.astype(jnp.int32), axis=1)
        chosen = (below | (at & (at_rank <= allowed[:, None])))
        chosen = (chosen & started[:, None] & (k_r > 0)[:, None]).reshape(-1)
        new_status = jnp.where(chosen, jnp.int8(STATUS_VACCINATED), status)
        new_elig = eligible
        if not cfg.faithful_vaccine_bugs:
            new_elig = eligible & ~chosen
            new_status = jnp.where(
                chosen & (status != STATUS_SUSCEPTIBLE), status, new_status
            )
        return new_status, new_elig

    # Gate on any ELIGIBLE citizen, not any started replica: eligible lanes
    # are only true between a replica's activation and its pool draining
    # (~pool/rate steps), so the cond stops firing for the rest of the run
    # — a fired vaccinate-cond stalls this runtime even with a trivial
    # body (docs/PERF.md, tools/probe_vax_parts2), and with 64 replicas
    # SOME replica latches early and would otherwise pin the cond on for
    # every remaining step.  Value-identical: no eligible => every k_r
    # is min(rate, 0) = 0 => nobody chosen.
    status, eligible = jax.lax.cond(
        jnp.any(eligible),
        vaccinate,
        lambda args: args,
        (status, eligible),
    )

    new_state = PackedState(
        status=status, timer=timer, at_work=at_work, on_bus=on_bus,
        at_work_ws=at_work_ws, on_bus_ws=on_bus_ws,
        eligible=eligible, hour=hour, lockdown=lockdown,
        mask_status=ms_next, vaccination_started=vaccination_started,
        rng_key=state.rng_key,
    )
    return new_state, seirv


def make_packed_runner(pe: PackedEnsemble, cfg: SimConfig):
    """jitted chunk(thresholds, state) -> (state, (chunk, R, 5))."""
    s = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def chunk(pe_d, th, state):
        def body(carry, _):
            ns, seirv = packed_step(pe_d, th, cfg, carry)
            return ns, seirv

        return jax.lax.scan(body, state, None, length=cfg.chunk_size)

    jitted = jax.jit(chunk, donate_argnums=(2,), in_shardings=(s, s, s))
    pe_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), s)
        if hasattr(x, "shape") else x,
        pe,
    )

    def run_chunk(th, state):
        return jitted(pe_d, th, state)

    return run_chunk


def run_packed_ensemble(base: World, param_list: list[Params],
                        cfg: SimConfig, *, seed: int = 0):
    """Pack, run to cfg.max_steps (early exit when ALL replicas are done);
    returns (R, T, 5) SEIRV series.  Thresholds are shared (param_list[0])."""
    pe = pack_replicas(base, param_list)
    state = init_packed_state(
        pe, seed=seed, starting_infected=cfg.starting_infected
    )
    th = param_list[0].as_arrays().thresholds
    runner = make_packed_runner(pe, cfg)
    chunks = []
    steps = 0
    while steps < cfg.max_steps:
        state, seirv = runner(th, state)
        seirv = np.asarray(seirv)  # (chunk, R, 5)
        chunks.append(seirv)
        steps += cfg.chunk_size
        if not (seirv[-1, :, :3].sum(axis=1) > 0).any():
            break
    out = np.concatenate(chunks, axis=0)[: cfg.max_steps]
    return np.transpose(out, (1, 0, 2))
