"""Teachers-per-LA workforce table (teachers_per_local_authority.rs).

The reference's table is commented out of its build (tables/mod.rs:36) and
its aggregation body never compiled; these tests pin the intended surface:
per-LA aggregation keyed by new_la_code, with typed validation errors.
"""

import pandas as pd
import pytest

from epidemicsimulator_tpu.data.census.teachers import (
    TeacherRecord,
    load_teachers,
    parse_teachers,
)
from epidemicsimulator_tpu.errors import (
    MismatchedDataError,
    MissingDataError,
    ValueParsingError,
)


def _frame(rows):
    cols = [
        "new_la_code", "la_name", "region_name", "school_type",
        "number_schools", "fte_all_teachers", "fte_classroom_teachers",
        "fte_teaching_assistants", "hc_all_teachers",
    ]
    return pd.DataFrame(rows, columns=cols)


def test_total_row_wins():
    df = _frame([
        ["E08000032", "Bradford", "North", "Primary", "100", "900.5",
         "800.0", "400.0", "950"],
        ["E08000032", "Bradford", "North", "Secondary", "40", "700.0",
         "600.0", "200.0", "720"],
        ["E08000032", "Bradford", "North", "Total", "140", "1600.5",
         "1400.0", "600.0", "1670"],
    ])
    rec = parse_teachers(df)["E08000032"]
    assert rec.number_schools == 140
    assert rec.fte_all_teachers == pytest.approx(1600.5)
    assert rec.hc_all_teachers == 1670
    # the Total pseudo-type is excluded from the per-type breakdown
    assert set(rec.fte_by_school_type) == {"Primary", "Secondary"}
    assert rec.teachers_per_school == pytest.approx(1600.5 / 140)


def test_sum_when_no_total_row_and_suppressed_cells():
    df = _frame([
        ["E06000014", "York", "North", "Primary", "50", "400.0",
         "350.0", "150.0", "420"],
        # DfE suppression markers parse as 0
        ["E06000014", "York", "North", "Secondary", "20", "x",
         "..", "z", "310"],
    ])
    rec = parse_teachers(df)["E06000014"]
    assert rec.number_schools == 70
    assert rec.fte_all_teachers == pytest.approx(400.0)
    assert rec.hc_all_teachers == 730


def test_multiple_las_grouped():
    df = _frame([
        ["E06000014", "York", "North", "Total", "70", "710.0", "620.0",
         "250.0", "730"],
        ["E08000032", "Bradford", "North", "Total", "140", "1600.5",
         "1400.0", "600.0", "1670"],
    ])
    recs = parse_teachers(df)
    assert sorted(recs) == ["E06000014", "E08000032"]
    assert isinstance(recs["E06000014"], TeacherRecord)


def test_empty_is_typed_error():
    # teachers_per_local_authority.rs:154-161 IsEmpty
    with pytest.raises(MissingDataError):
        parse_teachers(_frame([]))


def test_missing_columns_is_typed_error():
    with pytest.raises(MissingDataError):
        parse_teachers(pd.DataFrame({"new_la_code": ["E1"]}))


def test_unsupported_region_rejected():
    # teachers_per_local_authority.rs:163-165 "Area code is not supported!"
    df = _frame([
        ["E08000032", "Bradford", "Yorkshire and The Humber", "Total",
         "140", "1600.5", "1400.0", "600.0", "1670"],
    ])
    with pytest.raises(ValueParsingError):
        parse_teachers(df)


def test_mismatched_la_name_rejected():
    # ParseErrorType::Mismatching semantics (rs:171-181)
    df = _frame([
        ["E06000014", "York", "North", "Primary", "50", "400.0", "350.0",
         "150.0", "420"],
        ["E06000014", "NotYork", "North", "Secondary", "20", "300.0",
         "260.0", "100.0", "310"],
    ])
    with pytest.raises(MismatchedDataError):
        parse_teachers(df)


def test_load_from_disk(tmp_path):
    df = _frame([
        ["E06000014", "York", "North", "Total", "70", "710.0", "620.0",
         "250.0", "730"],
    ])
    p = tmp_path / "workforce.csv"
    df.to_csv(p, index=False)
    recs = load_teachers(str(p))
    assert recs["E06000014"].fte_all_teachers == pytest.approx(710.0)
