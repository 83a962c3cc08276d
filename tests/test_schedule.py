"""Schedule/movement semantics vs citizen.rs:168-216, including the
lockdown freeze (the whole match is skipped under lockdown, so positions and
even the on-bus flag are retained)."""

import jax
import jax.numpy as jnp
import numpy as np

from epidemicsimulator_tpu import Params, SimConfig, step
from epidemicsimulator_tpu.config import STATUS_SUSCEPTIBLE
from helpers import jit_step, micro_world, state_with_status


def _no_disease_params():
    p = Params.covid()
    return Params(
        disease=p.disease.__class__(exposure_chance=0.0),
        # Disable all interventions so lockdown stays off.
        thresholds=p.thresholds.__class__(
            lockdown=-1.0,
            vaccination=-1.0,
            mask_public_transport=2.0,
            mask_everywhere=2.0,
        ),
    ).as_arrays()


def _trace(world, hours, state=None, params=None):
    cfg = SimConfig()
    params = params or _no_disease_params()
    st = state or state_with_status(world, [STATUS_SUSCEPTIBLE] * world.n_citizens)
    rows = []
    for _ in range(hours):
        st, _out = jit_step(world, params, cfg, st)
        rows.append(
            (
                int(st.hour),
                bool(st.at_work[0]),
                bool(st.on_bus[0]),
                bool(st.bus_to_work[0]),
            )
        )
    return st, rows


def test_commuter_daily_pattern():
    w = micro_world(
        home_building=[0], work_building=[1], uses_transport=[True]
    ).device_put()
    _, rows = _trace(w, 48)
    for hour, at_work, on_bus, to_work in rows:
        h24 = hour % 24
        if h24 == 8:
            assert on_bus and to_work and not at_work
        elif 9 <= h24 <= 15:
            assert at_work and not on_bus
        elif h24 == 16:
            assert on_bus and not to_work and at_work  # still positioned at work
        else:
            assert not on_bus
            if h24 >= 17 or h24 < 9:
                assert not at_work


def test_non_transport_user_never_rides():
    w = micro_world(
        home_building=[0], work_building=[1], uses_transport=[False]
    ).device_put()
    _, rows = _trace(w, 48)
    assert not any(r[2] for r in rows)
    for hour, at_work, _, _ in rows:
        assert at_work == (9 <= hour % 24 <= 16)


def test_lockdown_freezes_position_and_bus():
    w = micro_world(
        home_building=[0], work_building=[1], uses_transport=[True]
    ).device_put()
    cfg = SimConfig()
    params = _no_disease_params()
    st = state_with_status(w, [STATUS_SUSCEPTIBLE])
    # Run to hour 8 (on the bus), then impose lockdown manually.
    for _ in range(8):
        st, _ = jit_step(w, params, cfg, st)
    assert bool(st.on_bus[0])
    st = st.__class__(
        **{
            **{f: getattr(st, f) for f in st.__dataclass_fields__},
            "lockdown": jnp.asarray(True),
        }
    )
    # Under lockdown the rider stays on the bus indefinitely (citizen.rs:176
    # skips the match; the reference rider keeps their Some(route)).
    for _ in range(30):
        prev = (bool(st.at_work[0]), bool(st.on_bus[0]), bool(st.bus_to_work[0]))
        st, _ = jit_step(w, params, cfg, st)
        # lockdown recomputed from thresholds each step -> re-force it
        st = st.__class__(
            **{
                **{f: getattr(st, f) for f in st.__dataclass_fields__},
                "lockdown": jnp.asarray(True),
            }
        )
        assert (
            bool(st.at_work[0]),
            bool(st.on_bus[0]),
            bool(st.bus_to_work[0]),
        ) == prev


def test_lockdown_lift_resumes_at_next_transition():
    w = micro_world(home_building=[0], work_building=[1]).device_put()
    cfg = SimConfig()
    params = _no_disease_params()
    st = state_with_status(w, [STATUS_SUSCEPTIBLE])
    # Get to hour 12 (at work), lock down through hour 20, then lift.
    for _ in range(12):
        st, _ = jit_step(w, params, cfg, st)
    assert bool(st.at_work[0])
    for _ in range(8):  # hours 13..20 under lockdown
        st = st.__class__(
            **{
                **{f: getattr(st, f) for f in st.__dataclass_fields__},
                "lockdown": jnp.asarray(True),
            }
        )
        st, _ = jit_step(w, params, cfg, st)
    # Hour-17 transition was missed; still at work after lifting...
    assert bool(st.at_work[0])
    # ...until the next hour-17 (hours 21..41 pass; goes home at 41 % 24 == 17)
    home_hours = []
    for _ in range(24):
        st, _ = jit_step(w, params, cfg, st)
        if not bool(st.at_work[0]):
            home_hours.append(int(st.hour))
            break
    assert home_hours and home_hours[0] % 24 == 17
