"""Hand-built micro-worlds and cached compiled runners for scenario tests."""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from epidemicsimulator_tpu.world.schema import World, make_world


def micro_world(
    *,
    home_building,
    work_building,
    home_oa=None,
    work_oa=None,
    room=None,
    is_school_work=None,
    uses_transport=None,
    mask_compliant=None,
    age=30,
    occupation=1,
    n_buildings=None,
    n_rooms=0,
    n_output_areas=1,
) -> World:
    n = len(home_building)
    home_building = np.asarray(home_building)
    work_building = np.asarray(work_building)
    if n_buildings is None:
        n_buildings = int(max(home_building.max(), work_building.max())) + 1

    def default(x, val):
        return np.full(n, val) if x is None else np.asarray(x)

    return make_world(
        age=default(None, age) if np.isscalar(age) else np.asarray(age),
        occupation=default(None, occupation)
        if np.isscalar(occupation)
        else np.asarray(occupation),
        home_building=home_building,
        work_building=work_building,
        home_oa=default(home_oa, 0),
        work_oa=default(work_oa, 0),
        room=default(room, n_rooms),
        is_school_work=default(is_school_work, False).astype(bool),
        uses_transport=default(uses_transport, False).astype(bool),
        mask_compliant=default(mask_compliant, False).astype(bool),
        n_buildings=n_buildings,
        n_rooms=n_rooms,
        n_output_areas=n_output_areas,
    )


@functools.lru_cache(maxsize=None)
def _scan_runner(cfg, n_steps):
    import jax

    from epidemicsimulator_tpu.engine.step import step

    def scan_fn(world, params, state):
        def body(carry, _):
            ns, _out = step(world, params, cfg, carry)
            return ns, (ns.status, ns.timer, ns.at_work, ns.on_bus, ns.bus_to_work)

        return jax.lax.scan(body, state, None, length=n_steps)

    return jax.jit(scan_fn)


def run_steps_scan(world, params, cfg, state, n_steps):
    """Scan n_steps; returns (final_state, per-step (status, timer, at_work,
    on_bus, bus_to_work) trajectories).  Compiled once per (cfg, n_steps,
    shapes)."""
    return _scan_runner(cfg, n_steps)(world, params, state)


@functools.lru_cache(maxsize=None)
def _vmapped_step(cfg):
    import jax

    from epidemicsimulator_tpu.engine.step import step

    def one(world, params, state, key):
        st = dataclasses.replace(state, rng_key=key)
        return step(world, params, cfg, st)

    return jax.jit(jax.vmap(one, in_axes=(None, None, None, 0)))


def step_many_keys(world, params, cfg, state, keys):
    """One step vmapped over a batch of rng keys -> (batched states, outs)."""
    return _vmapped_step(cfg)(world, params, state, keys)


@functools.lru_cache(maxsize=None)
def _single_step(cfg):
    import jax

    from epidemicsimulator_tpu.engine.step import step

    return jax.jit(functools.partial(step, cfg=cfg))


def jit_step(world, params, cfg, state):
    """Single cached-compile step call."""
    return _single_step(cfg)(world, params, state=state)


def state_with_status(world, status, **overrides):
    """An init_state with a forced status lane.  Citizen-order overrides of
    replicated lanes (status/timer/at_work/on_bus) are mirrored into their
    work-/rider-order twins so the replicated fast path stays consistent."""
    import jax.numpy as jnp

    from epidemicsimulator_tpu.engine.state import init_state, with_status

    st = init_state(world, seed=0, starting_infected=0)
    st = with_status(st, world, np.asarray(status, np.int8))
    if overrides:
        st = dataclasses.replace(st, **{
            k: jnp.asarray(v) for k, v in overrides.items()
        })
        wp = jnp.asarray(world.work_perm)
        rp = jnp.asarray(world.rider_perm)
        twins = {}
        if "timer" in overrides and st.timer_ws is not None:
            twins["timer_ws"] = jnp.take(st.timer, wp)
            twins["timer_r"] = jnp.take(st.timer, rp)
        if "at_work" in overrides and st.at_work_ws is not None:
            twins["at_work_ws"] = jnp.take(jnp.asarray(st.at_work), wp)
        if "on_bus" in overrides and st.on_bus_ws is not None:
            twins["on_bus_ws"] = jnp.take(jnp.asarray(st.on_bus), wp)
            twins["on_bus_r"] = jnp.take(jnp.asarray(st.on_bus), rp)
        if twins:
            st = dataclasses.replace(st, **twins)
    return st
