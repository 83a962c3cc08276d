"""Bulk (wide-format) census table parsing — both header styles."""

import numpy as np
import pandas as pd
import pytest

from epidemicsimulator_tpu.data.census.bulk import (
    parse_bulk_age,
    parse_bulk_occupation,
    parse_bulk_population,
)


def test_bulk_age_nomis_codes(tmp_path):
    cols = {"GeographyCode": ["E1", "E2"], "QS103EW0001": [10, 20]}
    for a in range(101):
        cols[f"QS103EW{a + 2:04d}"] = [a % 3, (a + 1) % 3]
    p = tmp_path / "q.csv"
    pd.DataFrame(cols).to_csv(p, index=False)
    out = parse_bulk_age(str(p))
    assert set(out["age"]) == set(range(101))
    e1 = out[out["code"] == "E1"].sort_values("age")["count"].to_numpy()
    assert (e1 == np.arange(101) % 3).all()


def test_bulk_occupation_descriptive(tmp_path):
    cols = {
        "date": [2011], "geography": ["x"], "geography code": ["E9"],
        "Occupation: all categories: Occupation; measures: Value": [45],
    }
    names = [
        "Occupation: 1. managers, directors and senior officials; measures: Value",
        "Occupation: 2. professional occupations; measures: Value",
        "Occupation: 3. Associate professional and technical occupations; measures: Value",
        "Occupation: 4. administrative and secretarial occupations; measures: Value",
        "Occupation: 5. Skilled trades occupations; measures: Value",
        "Occupation: 6. caring, leisure and other service occupations; measures: Value",
        "Occupation: 7. sales and customer service occupations; measures: Value",
        "Occupation: 8. Process plant and machine operatives; measures: Value",
        "Occupation: 9. Elementary occupations; measures: Value",
    ]
    for i, nm in enumerate(names):
        cols[nm] = [i + 1]
    p = tmp_path / "o.csv"
    pd.DataFrame(cols).to_csv(p, index=False)
    out = parse_bulk_occupation(str(p)).sort_values("occupation")
    assert (out["count"].to_numpy() == np.arange(1, 10)).all()
    assert (out["code"] == "E9").all()


def test_bulk_population_codes(tmp_path):
    cols = {
        "GeographyCode": ["E5"],
        "KS101EW0001": [300], "KS101EW0002": [150], "KS101EW0003": [150],
        "KS101EW0004": [295], "KS101EW0005": [5], "KS101EW0006": [40],
        "KS101EW0007": [12.5], "KS101EW0008": [24.0],
    }
    p = tmp_path / "k.csv"
    pd.DataFrame(cols).to_csv(p, index=False)
    out = parse_bulk_population(str(p))
    vals = dict(zip(out["cell"], out["value"]))
    assert vals["All usual residents"] == 300
    assert vals["Area (Hectares)"] == 12.5


def test_bulk_end_to_end_container(tmp_path):
    import os

    from epidemicsimulator_tpu.data.census.container import load_census_data
    from epidemicsimulator_tpu.data.census.tables import CensusTable, TABLE_SPECS

    # age
    cols = {"GeographyCode": ["E1"]}
    for a in range(101):
        cols[f"QS103EW{a + 2:04d}"] = [2]
    path = tmp_path / TABLE_SPECS[CensusTable.AGE_STRUCTURE].bulk_filename
    os.makedirs(path.parent, exist_ok=True)
    pd.DataFrame(cols).to_csv(path, index=False)
    # occupation
    cols = {"GeographyCode": ["E1"]}
    for i in range(9):
        cols[f"KS608EW{i + 2:04d}"] = [i + 1]
    path = tmp_path / TABLE_SPECS[CensusTable.OCCUPATION_COUNT].bulk_filename
    os.makedirs(path.parent, exist_ok=True)
    pd.DataFrame(cols).to_csv(path, index=False)
    # population
    cols = {"GeographyCode": ["E1"], "KS101EW0001": [202], "KS101EW0007": [10.0]}
    path = tmp_path / TABLE_SPECS[CensusTable.POPULATION_DENSITY].bulk_filename
    os.makedirs(path.parent, exist_ok=True)
    pd.DataFrame(cols).to_csv(path, index=False)
    # commuting (bulk style)
    pd.DataFrame(
        {
            "Area of usual residence": ["E1"],
            "Area of workplace": ["E1"],
            "count": [50],
        }
    ).to_csv(tmp_path / TABLE_SPECS[CensusTable.RESIDES_VS_WORKPLACE].bulk_filename,
             index=False)

    cd = load_census_data(str(tmp_path), bulk=True)
    assert cd.oa_codes == ["E1"]
    assert cd.age_histogram.sum() == 202
    assert cd.population_counts[0, 0] == 202
    filtered = cd.filter_incomplete_output_areas()
    assert filtered.oa_codes == ["E1"]
