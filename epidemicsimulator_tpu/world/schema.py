"""Static world representation: struct-of-arrays over N citizens.

The reference holds an object graph — ``Vec<Mutex<OutputArea>>`` each owning
``Vec<Citizen>`` and ``Vec<Box<dyn Building>>`` (simulator.rs:94-96).  The
TPU-native design inverts this: the world is a handful of parallel device
arrays indexed by citizen id, plus integer index tables.  Citizen identity is
the array index (the reference already carries a dense ``global_index``,
citizen.rs:53-54; the UUIDs exist only to make hashes unique and are dropped).

Mixing-group design (replaces the Building trait, building.rs:125-140):

* ``home_building`` — global building id of the household.  Household
  exposure exposes all residents (building.rs:202-204), which is exactly a
  segment reduction over this lane.
* ``work_building`` — global building id of the daytime location: the
  workplace for workers, the school for students/teachers, and the *home*
  building for the unemployed (the reference initialises workplace_code to
  the household and never reassigns it for Unemployed, output_area.rs:163-167).
* ``room`` — for school occupants, the class/office mixing group
  (building.rs:494-522 confines school exposure to the infected's class or
  office).  Non-school citizens carry the sentinel ``n_rooms`` so their
  segment is dropped.

Positions are never stored per-citizen; the current building is
``where(at_work, work_building, home_building)`` with the at-work bit carried
through the scan (needed because lockdown freezes transitions,
citizen.rs:176-206).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class World:
    """Immutable world tables.  All per-citizen arrays have shape (N,).

    ``n_buildings``/``n_rooms``/``n_output_areas`` are static python ints
    (they shape segment reductions), marked as pytree metadata.
    """

    # --- per-citizen lanes ---
    age: Any                    # int16, years
    occupation: Any             # int8, OCC_* encoding
    home_building: Any          # int32 in [0, n_buildings)
    work_building: Any          # int32 in [0, n_buildings)
    home_oa: Any                # int32 in [0, n_output_areas)
    work_oa: Any                # int32 in [0, n_output_areas)
    room: Any                   # int32 in [0, n_rooms], n_rooms = "no room"
    is_school_work: Any         # bool: work_building is a school
    uses_transport: Any         # bool (citizen.rs:159, 20% Bernoulli)
    mask_compliant: Any         # bool (output_area.rs:119 Bernoulli(0.8))
    work_start: Any             # int8, hour work begins (citizen.rs:154, 9)
    work_end: Any               # int8, hour work ends (citizen.rs:155, 17)

    # --- static sizes (pytree aux data) ---
    n_buildings: int = dataclasses.field(metadata=dict(static=True))
    n_rooms: int = dataclasses.field(metadata=dict(static=True))
    n_output_areas: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_citizens(self) -> int:
        return self.age.shape[-1]

    def validate(self) -> None:
        n = self.n_citizens
        for name in (
            "age", "occupation", "home_building", "work_building", "home_oa",
            "work_oa", "room", "is_school_work", "uses_transport",
            "mask_compliant", "work_start", "work_end",
        ):
            arr = getattr(self, name)
            assert arr.shape[-1] == n, f"{name}: {arr.shape} != ({n},)"
        hb = np.asarray(self.home_building)
        wb = np.asarray(self.work_building)
        assert hb.min() >= 0 and hb.max() < self.n_buildings
        assert wb.min() >= 0 and wb.max() < self.n_buildings
        rm = np.asarray(self.room)
        assert rm.min() >= 0 and rm.max() <= self.n_rooms
        ho = np.asarray(self.home_oa)
        wo = np.asarray(self.work_oa)
        assert ho.min() >= 0 and ho.max() < self.n_output_areas
        assert wo.min() >= 0 and wo.max() < self.n_output_areas

    def device_put(self) -> "World":
        return jax.tree.map(jnp.asarray, self)

    # ------------------------------------------------------------------
    # (De)serialisation — the preprocessing cache, the TPU analog of the
    # reference's bincode OSM cache (osm_data/src/lib.rs:395-474).
    # ------------------------------------------------------------------
    def save_npz(self, path: str) -> None:
        arrays = {
            f.name: np.asarray(getattr(self, f.name))
            for f in dataclasses.fields(self)
            if not f.metadata.get("static")
        }
        np.savez_compressed(
            path,
            __meta__=np.array(
                [self.n_buildings, self.n_rooms, self.n_output_areas], np.int64
            ),
            **arrays,
        )

    @staticmethod
    def load_npz(path: str) -> "World":
        with np.load(path) as data:
            meta = data["__meta__"]
            kwargs = {
                k: data[k] for k in data.files if k != "__meta__"
            }
        return World(
            n_buildings=int(meta[0]),
            n_rooms=int(meta[1]),
            n_output_areas=int(meta[2]),
            **kwargs,
        )


def make_world(
    *,
    age: np.ndarray,
    occupation: np.ndarray,
    home_building: np.ndarray,
    work_building: np.ndarray,
    home_oa: np.ndarray,
    work_oa: np.ndarray,
    room: np.ndarray,
    is_school_work: np.ndarray,
    uses_transport: np.ndarray,
    mask_compliant: np.ndarray,
    n_buildings: int,
    n_rooms: int,
    n_output_areas: int,
    work_start: np.ndarray | int = 9,
    work_end: np.ndarray | int = 17,
) -> World:
    """Build a validated ``World`` from host arrays, coercing dtypes."""
    n = len(age)

    def lane(x, dtype):
        if np.isscalar(x):
            x = np.full(n, x)
        return np.ascontiguousarray(x).astype(dtype)

    world = World(
        age=lane(age, np.int16),
        occupation=lane(occupation, np.int8),
        home_building=lane(home_building, np.int32),
        work_building=lane(work_building, np.int32),
        home_oa=lane(home_oa, np.int32),
        work_oa=lane(work_oa, np.int32),
        room=lane(room, np.int32),
        is_school_work=lane(is_school_work, np.bool_),
        uses_transport=lane(uses_transport, np.bool_),
        mask_compliant=lane(mask_compliant, np.bool_),
        work_start=lane(work_start, np.int8),
        work_end=lane(work_end, np.int8),
        n_buildings=int(n_buildings),
        n_rooms=int(n_rooms),
        n_output_areas=int(n_output_areas),
    )
    world.validate()
    return world
