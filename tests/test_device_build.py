"""On-device world construction (world/device_build.py).

Two contracts:

* ``build_tables_device`` is bit-for-bit identical to the numpy pipeline
  (make_world canonicalisation + build_index_tables + build_fast_tables)
  for the same core lanes.
* ``generate_synthetic_world_device`` produces worlds satisfying the same
  structural invariants as the numpy synthetic generator (different RNG, so
  equality is structural/statistical, not bitwise), deterministic per seed,
  and runnable by the engine with fast/portable agreement.
"""

import dataclasses

import numpy as np
import pytest

from epidemicsimulator_tpu import Params, SimConfig, generate_synthetic_world
from epidemicsimulator_tpu.config import (
    HOUSEHOLD_SIZE,
    MAX_STUDENT_AGE,
    OCC_STUDENT,
    OCC_UNEMPLOYED,
)
from epidemicsimulator_tpu.world.device_build import (
    build_tables_device,
    generate_synthetic_world_device,
)
from epidemicsimulator_tpu.world.schema import World


def _core_only(w: World) -> World:
    """Strip a fully-built world down to shuffled-core-lane form."""
    return World(
        n_buildings=w.n_buildings,
        n_rooms=w.n_rooms,
        n_output_areas=w.n_output_areas,
        **{name: np.asarray(getattr(w, name)) for name in World.CORE_LANES},
    )


@pytest.mark.parametrize("n,n_oa,seed", [(5000, 12, 7), (33333, 24, 1)])
def test_tables_device_match_numpy(n, n_oa, seed):
    ref = generate_synthetic_world(n, n_output_areas=n_oa, seed=seed)
    dev = build_tables_device(_core_only(ref))
    assert dev.n_buildings == ref.n_buildings
    assert dev.n_rooms == ref.n_rooms
    assert dev.max_household_size == ref.max_household_size
    for f in dataclasses.fields(World):
        if f.metadata.get("static"):
            continue
        a = getattr(ref, f.name)
        b = getattr(dev, f.name)
        if a is None:
            continue
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, f.name
        assert a.dtype == b.dtype, (f.name, a.dtype, b.dtype)
        np.testing.assert_array_equal(a, b, err_msg=f.name)


def test_tables_device_non_canonical_input():
    """Core lanes in a scrambled citizen order must canonicalise identically
    to make_world applied to the same scrambled input (stable-sort order is
    input-order-dependent, so both pipelines see the same lanes)."""
    from epidemicsimulator_tpu.world.schema import make_world

    base = generate_synthetic_world(4000, n_output_areas=8, seed=13)
    rng = np.random.default_rng(0)
    perm = rng.permutation(base.n_citizens)
    lanes = {
        name: np.asarray(getattr(base, name))[perm]
        for name in World.CORE_LANES
    }
    ref = make_world(
        n_buildings=base.n_buildings,
        n_rooms=base.n_rooms,
        n_output_areas=base.n_output_areas,
        **lanes,
    )
    shuffled = World(
        n_buildings=base.n_buildings,
        n_rooms=base.n_rooms,
        n_output_areas=base.n_output_areas,
        **lanes,
    )
    dev = build_tables_device(shuffled)
    for f in dataclasses.fields(World):
        if f.metadata.get("static"):
            continue
        a = getattr(ref, f.name)
        if a is None:
            continue
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(getattr(dev, f.name)), err_msg=f.name
        )


def test_synthetic_device_structure():
    w = generate_synthetic_world_device(5000, n_output_areas=12, seed=7)
    age = np.asarray(w.age)
    occ = np.asarray(w.occupation)
    assert ((occ == OCC_STUDENT) == (age < MAX_STUDENT_AGE)).all()
    hb, wb = np.asarray(w.home_building), np.asarray(w.work_building)
    unemployed = occ == OCC_UNEMPLOYED
    assert (hb[unemployed] == wb[unemployed]).all()
    ho = np.asarray(w.home_oa)
    for b in np.unique(hb[:200]):
        members = np.flatnonzero(hb == b)
        assert len(np.unique(ho[members])) == 1
        assert len(members) <= HOUSEHOLD_SIZE
    rooms = np.asarray(w.room)
    school = np.asarray(w.is_school_work)
    assert (rooms[school] < w.n_rooms).all()
    assert (rooms[~school] == w.n_rooms).all()
    assert abs(np.asarray(w.uses_transport).mean() - 0.2) < 0.03
    assert abs(np.asarray(w.mask_compliant).mean() - 0.8) < 0.03
    # every class room has exactly one staff member
    students = occ == OCC_STUDENT
    staff = school & ~students
    class_rooms = np.unique(rooms[students & school])
    staff_per_room = np.bincount(rooms[staff], minlength=w.n_rooms + 1)
    assert (staff_per_room[class_rooms] == 1).all()
    sizes = np.bincount(rooms[students], minlength=w.n_rooms + 1)[class_rooms]
    assert sizes.max() <= 27
    office_rooms = np.setdiff1d(np.unique(rooms[staff]), class_rooms)
    if len(office_rooms):
        assert staff_per_room[office_rooms].max() <= 12
    # index tables self-consistent: validate + canonical orderings
    _core_only(w).validate()
    assert (np.diff(np.asarray(w.home_building)) >= 0).all()
    wp = np.asarray(w.work_perm)
    wb_ws = np.asarray(w.work_building)[wp]
    assert (np.diff(wb_ws) >= 0).all()


def test_synthetic_device_deterministic():
    a = generate_synthetic_world_device(3000, n_output_areas=6, seed=5)
    b = generate_synthetic_world_device(3000, n_output_areas=6, seed=5)
    for name in World.CORE_LANES + ("work_perm", "rpos"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )
    c = generate_synthetic_world_device(3000, n_output_areas=6, seed=6)
    assert (np.asarray(a.age) != np.asarray(c.age)).any()


def test_synthetic_device_runs_fast_and_portable():
    """Deterministic regime (exposure_chance=1, vaccination off — the two
    formulations use different RNG streams, so only probability-0/1 draws
    compare) on a device-generated world: bitwise-identical curves."""
    from epidemicsimulator_tpu.engine.scan import run
    from epidemicsimulator_tpu.engine.state import init_state

    w = generate_synthetic_world_device(6000, n_output_areas=8, seed=2)
    base = Params.covid()
    params = Params(
        dataclasses.replace(
            base.disease, exposure_chance=1.0, exposed_time=6,
            infected_time=12, vaccination_rate=0,
        ),
        dataclasses.replace(
            base.thresholds, vaccination=-1.0,
            mask_public_transport=2.0, mask_everywhere=2.0,
        ),
    ).as_arrays()
    seirvs = []
    for fast in (True, False):
        cfg = SimConfig(
            max_steps=120, chunk_size=60, use_fast_path=fast,
            starting_infected=40, max_vaccinations_per_step=1,
        )
        state = init_state(w, seed=0, starting_infected=40)
        _, out = run(w, params, cfg, state)
        seirvs.append(np.asarray(out.seirv))
    np.testing.assert_array_equal(seirvs[0], seirvs[1])
    # epidemic actually spread (exposure_chance=1 with short timers can
    # burn out within the window — recovered counts prove transmission)
    assert seirvs[0][-1, 3] > 40
