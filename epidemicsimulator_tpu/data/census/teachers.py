"""Teachers-per-local-authority table (DfE school workforce census).

Counterpart of `load_census_data/src/tables/teachers_per_local_authority.rs`.
The reference declares the full DfE "School Workforce in England" CSV row
schema (teachers_per_local_authority.rs:31-123: per-LA, per-school-type FTE
and headcount staffing columns) keyed by ``new_la_code``
(:126-129 ``get_geography_code``), but the table is commented out of the
build (tables/mod.rs:36) and its aggregation body is bit-rotted — it is a
copy of the age-structure parser referencing fields the record type does not
have, so it never compiled.  What is reimplemented here is the *intended*
surface:

* the same CSV schema, keyed by ``new_la_code``;
* per-LA aggregation over school types into a ``TeacherRecord`` carrying the
  staffing quantities the world-builder could consume (teacher counts feed
  the school-construction phase, simulator_builder.rs:265-710, which today
  derives teacher demand purely from class counts);
* the reference's validation semantics: an empty record list and mismatched
  geography codes are typed parse errors (taxonomy from
  parsing_error.rs via ``errors.py``).

Numbers are FTE (full-time-equivalent) unless prefixed ``hc_`` (headcount),
matching the DfE column naming preserved in the schema.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pandas as pd

from ...errors import MismatchedDataError, MissingDataError

# The DfE workforce columns the aggregation consumes; the full reference
# schema (teachers_per_local_authority.rs:31-123) has ~100 columns — all
# others ride along in the raw frame untouched.
_REQUIRED = (
    "new_la_code",
    "la_name",
    "school_type",
    "number_schools",
    "fte_all_teachers",
    "fte_classroom_teachers",
    "fte_teaching_assistants",
    "hc_all_teachers",
)

# The reference rejects this region outright (teachers_per_local_authority.rs
# :163-165 "Area code is not supported!") — the workforce table has no
# Yorkshire & Humber rows at OA granularity.
_UNSUPPORTED_REGIONS = frozenset({"Yorkshire and The Humber"})


@dataclasses.dataclass(frozen=True)
class TeacherRecord:
    """Per-local-authority teacher staffing aggregate."""

    local_authority_code: str
    la_name: str
    number_schools: int
    fte_all_teachers: float
    fte_classroom_teachers: float
    fte_teaching_assistants: float
    hc_all_teachers: int
    # per-school-type breakdown: school_type -> fte_all_teachers
    fte_by_school_type: dict[str, float] = dataclasses.field(
        default_factory=dict
    )

    @property
    def teachers_per_school(self) -> float:
        """Mean FTE teachers per school in this LA — the quantity the
        school-builder would calibrate class/office staffing against."""
        return self.fte_all_teachers / max(self.number_schools, 1)


def _num(series: pd.Series) -> np.ndarray:
    # DfE publishes suppressed cells as "x"/"z"/".."; treat as 0 like any
    # missing observation.
    return pd.to_numeric(series, errors="coerce").fillna(0.0).to_numpy()


def parse_teachers(df: pd.DataFrame) -> dict[str, TeacherRecord]:
    """Aggregate raw workforce rows into one ``TeacherRecord`` per LA.

    Mirrors the TableEntry group-by-geography generation (tables/mod.rs:39-76)
    with the validation the reference's try_from intended: empty input and
    geography mismatches raise typed errors.
    """
    if len(df) == 0:
        raise MissingDataError(
            "PreProcessingRecord list is empty, can't build a TeacherRecord!"
        )
    missing = [c for c in _REQUIRED if c not in df.columns]
    if missing:
        raise MissingDataError(f"teacher workforce CSV lacks columns {missing}")
    if "region_name" in df.columns:
        bad = set(df["region_name"].unique()) & _UNSUPPORTED_REGIONS
        if bad:
            raise MismatchedDataError(f"Area code is not supported: {bad}")

    out: dict[str, TeacherRecord] = {}
    for code, grp in df.groupby("new_la_code", sort=True):
        names = grp["la_name"].unique()
        if len(names) > 1:
            raise MismatchedDataError(
                f"Mis matching geography codes for pre processing records: "
                f"LA {code} maps to names {sorted(names)}"
            )
        fte = _num(grp["fte_all_teachers"])
        by_type = {
            str(t): float(v)
            for t, v in zip(grp["school_type"].astype(str), fte)
        }
        # "Total" rows (DfE publishes per-type + a Total row) are the
        # aggregate; without one, sum the types.
        if "Total" in by_type:
            tot = grp[grp["school_type"].astype(str) == "Total"]
            n_schools = int(_num(tot["number_schools"])[0])
            fte_all = float(_num(tot["fte_all_teachers"])[0])
            fte_cls = float(_num(tot["fte_classroom_teachers"])[0])
            fte_ta = float(_num(tot["fte_teaching_assistants"])[0])
            hc_all = int(_num(tot["hc_all_teachers"])[0])
        else:
            n_schools = int(_num(grp["number_schools"]).sum())
            fte_all = float(fte.sum())
            fte_cls = float(_num(grp["fte_classroom_teachers"]).sum())
            fte_ta = float(_num(grp["fte_teaching_assistants"]).sum())
            hc_all = int(_num(grp["hc_all_teachers"]).sum())
        out[str(code)] = TeacherRecord(
            local_authority_code=str(code),
            la_name=str(names[0]),
            number_schools=n_schools,
            fte_all_teachers=fte_all,
            fte_classroom_teachers=fte_cls,
            fte_teaching_assistants=fte_ta,
            hc_all_teachers=hc_all,
            fte_by_school_type={
                k: v for k, v in by_type.items() if k != "Total"
            },
        )
    return out


def load_teachers(path: str) -> dict[str, TeacherRecord]:
    """Read a DfE workforce CSV from disk and aggregate per LA."""
    return parse_teachers(pd.read_csv(path, dtype=str))
