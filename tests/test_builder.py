"""End-to-end preprocessor: synthetic census + OSM -> World -> simulation."""

import numpy as np
import pytest

from epidemicsimulator_tpu.config import (
    MAX_STUDENT_AGE,
    OCC_STUDENT,
    OCC_UNEMPLOYED,
)
from epidemicsimulator_tpu.data.census.container import CensusData
from epidemicsimulator_tpu.world.preprocess.builder import (
    OSMBuildings,
    build_world,
    dedupe_close_buildings,
)


def _synthetic_inputs(n_oa=9, pop_per_oa=400, seed=0):
    rng = np.random.default_rng(seed)
    codes = [f"E{i:08d}" for i in range(n_oa)]
    side = int(np.ceil(np.sqrt(n_oa)))

    age_h = np.zeros((n_oa, 101), np.int32)
    age_h[:, :80] = rng.integers(1, 8, (n_oa, 80))
    occ_c = rng.integers(5, 40, (n_oa, 9)).astype(np.int32)
    pop_c = np.zeros((n_oa, 6), np.int32)
    pop_c[:, 0] = pop_per_oa

    # commuting: mostly local + neighbour
    ch, cwc, cc = [], [], []
    for o in range(n_oa):
        ch += [o, o]
        cwc += [codes[o], codes[(o + 1) % n_oa]]
        cc += [30, 10]
    census = CensusData(
        oa_codes=codes,
        age_histogram=age_h,
        occupation_counts=occ_c,
        population_counts=pop_c,
        area_hectares=np.full(n_oa, 25.0, np.float32),
        density=np.full(n_oa, 16.0, np.float32),
        commute_home=np.array(ch, np.int32),
        commute_work_code=np.array(cwc, object),
        commute_count=np.array(cc, np.int32),
    )

    # OA polygons: unit grid cells of 1000m
    rings, starts = [], [0]
    for o in range(n_oa):
        gx, gy = o % side, o // side
        x0, y0 = gx * 1000.0, gy * 1000.0
        rings += [
            (x0, y0), (x0 + 1000, y0), (x0 + 1000, y0 + 1000), (x0, y0 + 1000)
        ]
        starts.append(len(rings))
    rings = np.array(rings)
    starts = np.array(starts, np.int64)

    # buildings: 120 households per OA, 6 workplaces, 1 school per 3 OAs
    cls, e, n_, area = [], [], [], []
    for o in range(n_oa):
        gx, gy = o % side, o // side
        x0, y0 = gx * 1000.0, gy * 1000.0
        for _ in range(120):
            cls.append(3)  # household
            e.append(x0 + rng.uniform(50, 950))
            n_.append(y0 + rng.uniform(50, 950))
            area.append(100.0)
        for _ in range(6):
            cls.append(4)  # workplace
            e.append(x0 + rng.uniform(50, 950))
            n_.append(y0 + rng.uniform(50, 950))
            area.append(rng.uniform(500, 5000))
        if o % 3 == 0:
            cls.append(1)  # school
            e.append(x0 + 500)
            n_.append(y0 + 500)
            area.append(3000.0)
    osm = OSMBuildings(
        classes=np.array(cls, np.int32),
        east=np.array(e),
        north=np.array(n_),
        areas=np.array(area),
    )
    return census, osm, rings, starts, codes


def test_build_world_end_to_end():
    census, osm, rings, starts, codes = _synthetic_inputs()
    world = build_world(census, osm, rings, starts, codes, seed=1)
    n = world.n_citizens
    # population ~= 9 * 400, overshoot bounded by household size per OA
    assert 3600 <= n <= 3600 + 9 * 10
    occ = np.asarray(world.occupation)
    age = np.asarray(world.age)
    assert ((occ == OCC_STUDENT) == (age < MAX_STUDENT_AGE)).all()
    # students + teachers sit in school rooms
    school = np.asarray(world.is_school_work)
    assert school.sum() > 0
    rooms = np.asarray(world.room)
    assert (rooms[school] < world.n_rooms).all()
    assert (rooms[~school] == world.n_rooms).all()
    # fast tables exist (canonical ordering held)
    assert world.has_fast_tables
    assert world.oa_lo.shape[0] == world.n_output_areas

    # every worker's workplace building has bounded occupancy
    hb, wb = np.asarray(world.home_building), np.asarray(world.work_building)
    workers = (~school) & (occ <= 8)
    counts = np.bincount(wb[workers & (wb != hb)])
    assert counts.max() <= 500  # 5000 m^2 / 10 m^2-per-head worst case


def test_built_world_simulates():
    import dataclasses
    import jax.numpy as jnp

    from epidemicsimulator_tpu import Params, SimConfig
    from epidemicsimulator_tpu.engine.scan import run
    from epidemicsimulator_tpu.engine.state import init_state

    census, osm, rings, starts, codes = _synthetic_inputs()
    world = build_world(census, osm, rings, starts, codes, seed=1)
    base = Params.covid()
    params = Params(
        dataclasses.replace(base.disease, exposure_chance=0.02, exposed_time=24),
        base.thresholds,
    )
    cfg = SimConfig(max_steps=72, chunk_size=24, max_vaccinations_per_step=64)
    st = init_state(world, seed=0, starting_infected=20)
    _, out = run(world.device_put(), params, cfg, st)
    seirv = out.seirv
    assert (seirv.sum(axis=1) == world.n_citizens).all()
    assert seirv[-1, 1] + seirv[-1, 2] > 0  # epidemic progressed


def test_dedupe_close_buildings():
    classes = np.array([1, 1, 1, 2, 2], np.int32)
    east = np.array([0.0, 100.0, 5000.0, 0.0, 10000.0])
    north = np.array([0.0, 100.0, 5000.0, 0.0, 0.0])
    keep = dedupe_close_buildings(classes, east, north)
    # schools 0,1 within 500 manhattan -> one dropped; hospitals far apart
    assert keep.sum() == 4
    assert keep[2] and keep[3] and keep[4]
