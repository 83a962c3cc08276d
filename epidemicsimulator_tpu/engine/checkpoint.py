"""Simulation checkpoint/resume: the whole sim state is a handful of arrays.

The reference has no runtime checkpointing (runs are minutes-to-an-hour;
SURVEY.md §5) — its only adjacent mechanisms are the bincode OSM cache and
download resume.  Here a snapshot is one npz of the SimState plus the
recorder's accumulated series, so long runs survive preemption and can
continue bit-exactly (the rng key and hour are part of the state).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from .state import SimState

_SCALARS = ("hour", "lockdown", "vaccination_started", "mask_status")


def save_state(path: str, state: SimState, seirv_so_far: np.ndarray | None = None):
    arrays = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if v is None:
            continue
        if f.name == "rng_key":
            arrays["rng_key_data"] = np.asarray(jax.random.key_data(v))
        else:
            arrays[f.name] = np.asarray(v)
    if seirv_so_far is not None:
        arrays["__seirv__"] = np.asarray(seirv_so_far)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_state(path: str) -> tuple[SimState, np.ndarray | None]:
    with np.load(path) as data:
        kwargs = {}
        for name in data.files:
            if name in ("__seirv__", "rng_key_data"):
                continue
            kwargs[name] = jnp.asarray(data[name])
        key = jax.random.wrap_key_data(jnp.asarray(data["rng_key_data"]))
        seirv = data["__seirv__"] if "__seirv__" in data.files else None
    return SimState(rng_key=key, **kwargs), seirv
