"""Census table parsing + coordinate conversion golden tests."""

import os
import textwrap

import numpy as np
import pytest

from epidemicsimulator_tpu.data.census.container import (
    CensusData,
    load_census_data,
)
from epidemicsimulator_tpu.data.census.nomis import GEOGRAPHY_CODES, table_url
from epidemicsimulator_tpu.data.census.tables import CensusTable, TABLE_SPECS
from epidemicsimulator_tpu.data.geo.convert import (
    cartesian_to_latlon,
    latlon_to_cartesian,
    osgb36_to_grid,
    wgs84_to_national_grid,
    AIRY_A,
    AIRY_B,
    WGS84_A,
    WGS84_B,
)


@pytest.fixture()
def census_dir(tmp_path):
    d = tmp_path
    # Age structure: two OAs, triangle-ish histograms
    rows = ["GEOGRAPHY_NAME,GEOGRAPHY_TYPE,C_AGE,OBS_VALUE,RURAL_URBAN_NAME,OBS_STATUS,RECORD_OFFSET,RECORD_COUNT"]
    for code in ("E00000001", "E00000002"):
        for c_age in range(1, 102):
            v = 3 if code == "E00000001" else (1 if c_age < 30 else 0)
            rows.append(f"{code},output area,{c_age},{v},Total,A,0,202")
    (d / TABLE_SPECS[CensusTable.AGE_STRUCTURE].filename).write_text("\n".join(rows))

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
    for code in ("E00000001", "E00000002"):
        rows.append(f'{code},output area,All categories: Occupation,Value,45,A,0,0')
        for i, name in enumerate(occ_names):
            rows.append(f'{code},output area,"{name}",Value,{i + 1},A,0,0')
    (d / TABLE_SPECS[CensusTable.OCCUPATION_COUNT].filename).write_text("\n".join(rows))

    rows = ["GEOGRAPHY_NAME,GEOGRAPHY_TYPE,RURAL_URBAN_NAME,CELL_NAME,MEASURES_NAME,OBS_VALUE,OBS_STATUS,RECORD_OFFSET,RECORD_COUNT"]
    for code, pop in (("E00000001", 303), ("E00000002", 29)):
        rows.append(f"{code},output area,Total,All usual residents,Value,{pop},A,0,0")
        rows.append(f"{code},output area,Total,Males,Value,{pop // 2},A,0,0")
        rows.append(f"{code},output area,Total,Females,Value,{pop - pop // 2},A,0,0")
        rows.append(f"{code},output area,Total,Lives in a household,Value,{pop},A,0,0")
        rows.append(f"{code},output area,Total,Area (Hectares),Value,12.5,A,0,0")
        rows.append(
            f"{code},output area,Total,Density (number of persons per hectare),Value,4.2,A,0,0"
        )
    (d / TABLE_SPECS[CensusTable.POPULATION_DENSITY].filename).write_text("\n".join(rows))

    rows = ["CURRENTLY_RESIDING_IN_CODE,PLACE_OF_WORK_TYPE,PLACE_OF_WORK_NAME,OBS_VALUE,RECORD_OFFSET,RECORD_COUNT"]
    rows.append("E00000001,OA,E00000001,30,0,0")
    rows.append("E00000001,OA,E00000002,12,0,0")
    rows.append("E00000002,OA,E00000001,5,0,0")
    rows.append("E00000002,OA,E00000009,0,0,0")  # zero count -> dropped
    (d / TABLE_SPECS[CensusTable.RESIDES_VS_WORKPLACE].filename).write_text("\n".join(rows))
    return str(d)


def test_load_census_tables(census_dir):
    cd = load_census_data(census_dir)
    assert cd.oa_codes == ["E00000001", "E00000002"]
    assert cd.age_histogram[0].sum() == 303
    assert cd.age_histogram[1].sum() == 29
    assert (cd.occupation_counts[0] == np.arange(1, 10)).all()
    assert cd.population_counts[0, 0] == 303
    assert cd.area_hectares[0] == pytest.approx(12.5)
    # zero-count commute rows dropped (resides_vs_workplace.rs:138-141)
    assert len(cd.commute_count) == 3
    home, work, count = cd.commute_matrix()
    assert count.sum() == 47


def test_filter_incomplete(census_dir):
    cd = load_census_data(census_dir)
    # knock out occupation data for OA 2
    cd.occupation_counts[1] = 0
    filtered = cd.filter_incomplete_output_areas()
    assert filtered.oa_codes == ["E00000001"]
    # commuting rows to the dropped OA are gone
    home, work, count = filtered.commute_matrix()
    assert (work == 0).all()


def test_nomis_url_shape():
    url = table_url(CensusTable.AGE_STRUCTURE, GEOGRAPHY_CODES["1946157112"])
    assert "NM_503_1.data.csv" in url
    assert "recordlimit=1000000" in url
    assert "RecordOffset=0" in url
    assert "C_AGE" in url


# --- coordinate conversion golden values (convert.rs:221-405 strategy) -----

def test_os_worked_example_caister():
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e, n = osgb36_to_grid(lat, lon)
    assert abs(float(e) - 651409.903) < 0.005
    assert abs(float(n) - 313177.270) < 0.005


def test_cartesian_roundtrip():
    lat, lon = np.array([51.5, 53.3, 50.0]), np.array([-0.1, -2.2, -5.5])
    for a, b in ((WGS84_A, WGS84_B), (AIRY_A, AIRY_B)):
        x, y, z = latlon_to_cartesian(lat, lon, a, b)
        lat2, lon2, h = cartesian_to_latlon(x, y, z, a, b)
        assert np.allclose(lat, lat2, atol=1e-9)
        assert np.allclose(lon, lon2, atol=1e-9)
        assert np.allclose(h, 0, atol=1e-3)


def test_wgs84_chain_london():
    # Trafalgar Square (WGS84) ~ TQ 300 804
    e, n = wgs84_to_national_grid(51.50802, -0.12795)
    assert abs(float(e) - 530050) < 150
    assert abs(float(n) - 180400) < 150


def test_grid_vectorised():
    lats = np.linspace(50, 55, 100)
    lons = np.linspace(-5, 1, 100)
    e, n = wgs84_to_national_grid(lats, lons)
    assert e.shape == (100,)
    assert np.isfinite(e).all() and np.isfinite(n).all()
