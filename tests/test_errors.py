"""The typed error taxonomy (errors.py) is actually raised by the data layer.

Mirrors parsing_error.rs: malformed CSV / PBF / shapefile inputs surface as
DataLoadingError subclasses, not bare builtins, so callers can match on the
same partitions as the reference's enum variants.
"""

import struct

import pandas as pd
import pytest

from epidemicsimulator_tpu.errors import (
    DataLoadingError,
    MismatchedDataError,
    MissingDataError,
    OutOfBoundsError,
    ShapeFileError,
    ValueParsingError,
)


def test_bulk_missing_geography_column(tmp_path):
    from epidemicsimulator_tpu.data.census.bulk import parse_bulk_age

    p = tmp_path / "age.csv"
    pd.DataFrame({"foo": [1], "bar": [2]}).to_csv(p, index=False)
    with pytest.raises(MissingDataError):
        parse_bulk_age(str(p))


def test_bulk_no_age_columns(tmp_path):
    from epidemicsimulator_tpu.data.census.bulk import parse_bulk_age

    p = tmp_path / "age.csv"
    pd.DataFrame({"GeographyCode": ["E00000001"], "junk": [3]}).to_csv(
        p, index=False
    )
    with pytest.raises(MissingDataError):
        parse_bulk_age(str(p))


def test_age_bin_out_of_bounds(tmp_path):
    from epidemicsimulator_tpu.data.census.container import parse_age_structure

    p = tmp_path / "age.csv"
    pd.DataFrame(
        {
            "GEOGRAPHY_NAME": ["E00000001"],
            "C_AGE": [150],  # > 101 -> age bin beyond 100
            "OBS_VALUE": [5],
        }
    ).to_csv(p, index=False)
    with pytest.raises(OutOfBoundsError) as ei:
        parse_age_structure(str(p))
    assert ei.value.max_size == 100


def test_unknown_occupation_cell(tmp_path):
    from epidemicsimulator_tpu.data.census.container import parse_occupation

    p = tmp_path / "occ.csv"
    pd.DataFrame(
        {
            "GEOGRAPHY_NAME": ["E00000001"],
            "CELL_NAME": ["Not a real occupation"],
            "OBS_VALUE": ["4"],
        }
    ).to_csv(p, index=False)
    with pytest.raises(MissingDataError):
        parse_occupation(str(p))


def test_malformed_pbf(tmp_path):
    from epidemicsimulator_tpu.data.osm.native import parse_pbf

    p = tmp_path / "bad.osm.pbf"
    p.write_bytes(b"\x00\x00\x00\x10" + b"garbage!" * 4)
    with pytest.raises(ValueParsingError):
        parse_pbf(str(p))


def test_malformed_shapefile_header(tmp_path):
    from epidemicsimulator_tpu.data.osm.shapefile import read_polygons

    shp = tmp_path / "areas.shp"
    shp.write_bytes(b"\x00" * 10)  # truncated header
    with pytest.raises(ShapeFileError):
        read_polygons(str(shp))


def test_wrong_magic_shapefile(tmp_path):
    from epidemicsimulator_tpu.data.osm.shapefile import read_polygons

    shp = tmp_path / "areas.shp"
    # 100-byte header with the wrong magic number
    shp.write_bytes(struct.pack(">i", 1234) + b"\x00" * 96)
    with pytest.raises(ShapeFileError):
        read_polygons(str(shp))


def test_taxonomy_is_catchable_at_the_top():
    # every data-layer error is a DataLoadingError (parsing_error.rs:126)
    for exc in (
        MissingDataError,
        OutOfBoundsError,
        MismatchedDataError("m", 1, 2).__class__,
        ShapeFileError,
        ValueParsingError,
    ):
        assert issubclass(exc, DataLoadingError)
