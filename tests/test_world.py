"""Synthetic world invariants + npz cache roundtrip."""

import numpy as np

from epidemicsimulator_tpu import generate_synthetic_world
from epidemicsimulator_tpu.config import (
    HOUSEHOLD_SIZE,
    MAX_STUDENT_AGE,
    OCC_STUDENT,
    OCC_UNEMPLOYED,
)
from epidemicsimulator_tpu.world.schema import World


def test_world_structure():
    w = generate_synthetic_world(5000, n_output_areas=12, seed=7)
    age = np.asarray(w.age)
    occ = np.asarray(w.occupation)
    # students exactly = age < 18 (config.rs:38)
    assert ((occ == OCC_STUDENT) == (age < MAX_STUDENT_AGE)).all()
    # unemployed work at home (output_area.rs:163-167 never reassigns them)
    hb, wb = np.asarray(w.home_building), np.asarray(w.work_building)
    unemployed = occ == OCC_UNEMPLOYED
    assert (hb[unemployed] == wb[unemployed]).all()
    # households never cross OA boundaries and hold <= HOUSEHOLD_SIZE+? =
    # exactly HOUSEHOLD_SIZE except the last per OA
    ho = np.asarray(w.home_oa)
    for b in np.unique(hb[:200]):
        members = np.flatnonzero(hb == b)
        assert len(np.unique(ho[members])) == 1
        assert len(members) <= HOUSEHOLD_SIZE
    # school workers have a valid room; others carry the sentinel
    rooms = np.asarray(w.room)
    school = np.asarray(w.is_school_work)
    assert (rooms[school] < w.n_rooms).all()
    assert (rooms[~school] == w.n_rooms).all()
    # transport usage ~20%, mask compliance ~80%
    assert abs(np.asarray(w.uses_transport).mean() - 0.2) < 0.03
    assert abs(np.asarray(w.mask_compliant).mean() - 0.8) < 0.03


def test_each_class_has_one_teacher():
    w = generate_synthetic_world(8000, n_output_areas=8, seed=3)
    occ = np.asarray(w.occupation)
    rooms = np.asarray(w.room)
    school = np.asarray(w.is_school_work)
    students = occ == OCC_STUDENT
    staff = school & ~students
    # every class room (one containing students) has exactly one staff member
    class_rooms = np.unique(rooms[students & school])
    staff_per_room = np.bincount(rooms[staff], minlength=w.n_rooms + 1)
    assert (staff_per_room[class_rooms] == 1).all()
    # class sizes bounded by ceil-split around AVERAGE_CLASS_SIZE
    sizes = np.bincount(rooms[students], minlength=w.n_rooms + 1)[class_rooms]
    assert sizes.max() <= 27
    # office rooms hold <= 12 staff (building.rs:308)
    office_rooms = np.setdiff1d(np.unique(rooms[staff]), class_rooms)
    if len(office_rooms):
        assert staff_per_room[office_rooms].max() <= 12


def test_npz_roundtrip(tmp_path):
    w = generate_synthetic_world(2000, n_output_areas=4, seed=5)
    path = str(tmp_path / "world.npz")
    w.save_npz(path)
    w2 = World.load_npz(path)
    assert w2.n_buildings == w.n_buildings
    assert w2.n_rooms == w.n_rooms
    assert w2.n_output_areas == w.n_output_areas
    for name in ("age", "occupation", "home_building", "work_building", "room"):
        assert (np.asarray(getattr(w, name)) == np.asarray(getattr(w2, name))).all()
    # derived fast tables survive the roundtrip
    assert w2.has_index_tables and w2.has_fast_tables
    assert w2.max_household_size == w.max_household_size
    assert (np.asarray(w2.wpos) == np.asarray(w.wpos)).all()


def test_workplace_capacity_respected():
    w = generate_synthetic_world(20000, n_output_areas=10, seed=11)
    occ = np.asarray(w.occupation)
    wb = np.asarray(w.work_building)
    hb = np.asarray(w.home_building)
    school = np.asarray(w.is_school_work)
    workers = (~school) & (occ <= 8) & (wb != hb)
    from epidemicsimulator_tpu.world.synthetic import _WORKPLACE_CAPACITY

    for o in range(9):
        sel = workers & (occ == o)
        if not sel.any():
            continue
        counts = np.bincount(wb[sel])
        assert counts.max() <= _WORKPLACE_CAPACITY[o]
