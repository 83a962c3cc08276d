"""End-to-end integration: census CSVs + OSM PBF + OA shapefile -> CLI
--simulate -> reference JSON artifacts.  Exercises every data-layer format
for real (the run/load_data.rs + simulator_builder.rs + simulator.rs stack)."""

import json
import os

import numpy as np
import pytest

from epidemicsimulator_tpu.data.census.tables import CensusTable, TABLE_SPECS
from epidemicsimulator_tpu.data.geo.convert import wgs84_to_national_grid
from epidemicsimulator_tpu.data.osm.shapefile import write_polygons
from pbf_writer import build_pbf

N_OA = 4
POP_PER_OA = 300


@pytest.fixture()
def data_dir(tmp_path):
    rng = np.random.default_rng(7)
    codes = [f"E0000010{i}" for i in range(N_OA)]

    # --- buildings in WGS84 within a small box near York ------------------
    lat0, lon0 = 53.95, -1.10
    dlat, dlon = 0.02, 0.03  # ~2.2km x ~2km split into 4 vertical strips
    nodes = []
    nid = 1
    ways = []
    node_of = {}

    def add_node(lat, lon, tags=None):
        nonlocal nid
        nodes.append((nid, lat, lon, tags or {}))
        node_of[nid] = (lat, lon)
        nid_out = nid
        nid += 1
        return nid_out

    for oa in range(N_OA):
        lo = lon0 + oa * dlon / N_OA
        hi = lon0 + (oa + 1) * dlon / N_OA
        for _ in range(90):  # households
            add_node(
                rng.uniform(lat0 + 0.001, lat0 + dlat - 0.001),
                rng.uniform(lo + 0.0005, hi - 0.0005),
                {"building": "house"},
            )
        for _ in range(5):  # workplaces as small ways
            la = rng.uniform(lat0 + 0.002, lat0 + dlat - 0.002)
            lg = rng.uniform(lo + 0.001, hi - 0.001)
            ring = [
                add_node(la, lg), add_node(la + 3e-4, lg),
                add_node(la + 3e-4, lg + 3e-4), add_node(la, lg + 3e-4),
            ]
            ways.append((1000 + oa * 10 + len(ways), ring + [ring[0]],
                         {"building": "commercial"}))
        if oa % 2 == 0:  # a school per 2 OAs
            add_node(
                lat0 + dlat / 2, (lo + hi) / 2, {"amenity": "school"}
            )
    pbf_path = tmp_path / "test.osm.pbf"
    pbf_path.write_bytes(build_pbf(nodes, ways))

    # --- OA polygons in national grid: strips covering the box ------------
    corners_lat = np.array([lat0, lat0 + dlat])
    polys = []
    for oa in range(N_OA):
        lo = lon0 + oa * dlon / N_OA
        hi = lon0 + (oa + 1) * dlon / N_OA
        lats = np.array([lat0 - 0.002, lat0 - 0.002, lat0 + dlat + 0.002,
                         lat0 + dlat + 0.002])
        lons = np.array([lo, hi, hi, lo])
        e, n = wgs84_to_national_grid(lats, lons)
        polys.append(np.c_[e, n])
    shp_path = tmp_path / "areas.shp"
    write_polygons(str(shp_path), codes, polys)

    # --- census CSVs (API long format) -------------------------------------
    rows = ["GEOGRAPHY_NAME,GEOGRAPHY_TYPE,C_AGE,OBS_VALUE,RURAL_URBAN_NAME,OBS_STATUS,RECORD_OFFSET,RECORD_COUNT"]
    for c in codes:
        for c_age in range(1, 102):
            rows.append(f"{c},output area,{c_age},{3 if c_age < 85 else 0},Total,A,0,0")
    (tmp_path / TABLE_SPECS[CensusTable.AGE_STRUCTURE].filename).write_text("\n".join(rows))

    occ_names = [
        "1. Managers, directors and senior officials",
        "2. Professional occupations",
        "3. Associate professional and technical occupations",
        "4. Administrative and secretarial occupations",
        "5. Skilled trades occupations",
        "6. Caring, leisure and other service occupations",
        "7. Sales and customer service occupations",
        "8. Process plant and machine operatives",
        "9. Elementary occupations",
    ]
    rows = ["GEOGRAPHY_NAME,GEOGRAPHY_TYPE,CELL_NAME,MEASURES_NAME,OBS_VALUE,OBS_STATUS,RECORD_OFFSET,RECORD_COUNT"]
    for c in codes:
        for i, name in enumerate(occ_names):
            rows.append(f'{c},output area,"{name}",Value,{10 + i},A,0,0')
    (tmp_path / TABLE_SPECS[CensusTable.OCCUPATION_COUNT].filename).write_text("\n".join(rows))

    rows = ["GEOGRAPHY_NAME,GEOGRAPHY_TYPE,RURAL_URBAN_NAME,CELL_NAME,MEASURES_NAME,OBS_VALUE,OBS_STATUS,RECORD_OFFSET,RECORD_COUNT"]
    for c in codes:
        rows.append(f"{c},output area,Total,All usual residents,Value,{POP_PER_OA},A,0,0")
        rows.append(f"{c},output area,Total,Lives in a household,Value,{POP_PER_OA},A,0,0")
        rows.append(f"{c},output area,Total,Area (Hectares),Value,50,A,0,0")
    (tmp_path / TABLE_SPECS[CensusTable.POPULATION_DENSITY].filename).write_text("\n".join(rows))

    rows = ["CURRENTLY_RESIDING_IN_CODE,PLACE_OF_WORK_TYPE,PLACE_OF_WORK_NAME,OBS_VALUE,RECORD_OFFSET,RECORD_COUNT"]
    for i, c in enumerate(codes):
        rows.append(f"{c},OA,{c},25,0,0")
        rows.append(f"{c},OA,{codes[(i + 1) % N_OA]},10,0,0")
    (tmp_path / TABLE_SPECS[CensusTable.RESIDES_VS_WORKPLACE].filename).write_text("\n".join(rows))

    return tmp_path, str(pbf_path), str(shp_path)


def test_cli_full_pipeline_simulate(data_dir):
    tmp_path, pbf, shp = data_dir
    from epidemicsimulator_tpu.cli import main

    out = str(tmp_path / "results")
    rc = main(
        [
            "testarea", "--directory", str(tmp_path), "--simulate",
            "--pbf", pbf, "--shapefile", shp,
            "--max-steps", "48", "--chunk-size", "24",
            "--output-name", out, "--seed", "1",
        ]
    )
    assert rc == 0
    stats = json.load(open(out + os.sep + "global_stats.json"))
    total = sum(stats[0][k] for k in ("susceptible", "exposed", "infected",
                                      "recovered", "vaccinated"))
    # the builder generates whole households until each OA's population
    # target is met (output_area.rs:145 semantics) — total ~= 4 * 300
    assert N_OA * POP_PER_OA <= total <= N_OA * POP_PER_OA + N_OA * 20
    # the world cache was written; a --use-cache rerun loads it
    assert (tmp_path / "world_testarea.npz").exists()
    assert os.path.exists(pbf + ".parsed.npz")
    rc = main(
        [
            "testarea", "--directory", str(tmp_path), "--simulate",
            "--use-cache", "--max-steps", "24", "--chunk-size", "12",
            "--output-name", str(tmp_path / "r2"), "--seed", "2",
        ]
    )
    assert rc == 0


def test_cli_pipeline_generated_fixture(tmp_path):
    """The York-scale fixture generator (tools/gen_fixture.py) drives the
    same CLI data path at CI scale: real-encoding PBF (OSMHeader +
    multi-blob), duplicate schools for the dedupe pass, distance-decayed
    commuting flows.  tools/run_york_pipeline.py is this test at 637 OAs."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_fixture import write_fixture

    from epidemicsimulator_tpu.cli import main

    n_oas, pop = 24, 200
    pbf, shp, codes = write_fixture(
        str(tmp_path), n_oas=n_oas, pop_per_oa=pop, seed=3
    )
    out = str(tmp_path / "results")
    rc = main(
        [
            "fixturearea", "--directory", str(tmp_path), "--simulate",
            "--pbf", pbf, "--shapefile", shp,
            "--max-steps", "48", "--chunk-size", "24",
            "--output-name", out, "--seed", "1",
        ]
    )
    assert rc == 0
    stats = json.load(open(out + os.sep + "global_stats.json"))
    total = sum(stats[0][k] for k in ("susceptible", "exposed", "infected",
                                      "recovered", "vaccinated"))
    assert n_oas * pop <= total <= n_oas * (pop + 30)
    # builder phase timings artifact written next to the world cache
    tjson = json.load(
        open(str(tmp_path / "world_fixturearea.npz") + ".build_timings.json")
    )
    assert set(tjson) == {
        "1_oa_setup", "2_building_to_oa", "3_citizens_households",
        "4_schools", "5_workplace_oa_sampling", "6_workplace_packing",
        "7_school_building_ids", "8_world_tables",
    }
