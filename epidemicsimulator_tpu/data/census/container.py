"""CensusData: per-output-area aggregates of the four NOMIS tables.

The pandas/numpy equivalent of `load_census_data/src/lib.rs` — long-format
CSV rows are grouped by output area into dense arrays:

* age histogram, 101 bins (age_structure.rs:118-131: C_AGE is 1-based,
  bin 100 is "100 and over")
* occupation counts, 9 categories (occupation_count.rs:140-188; the "All"
  row is skipped)
* person-type population counts + area/density (KS101,
  population_and_density rs:100-160)
* residence->workplace commuting counts as a sparse matrix
  (resides_vs_workplace.rs:100-151; zero-count entries dropped)

``filter_incomplete_output_areas`` keeps only OAs present in all tables
(lib.rs:393-446).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import pandas as pd

from ...errors import MissingDataError, OutOfBoundsError
from .tables import (
    AREA_CELL,
    DENSITY_CELL,
    OCCUPATION_ALL_CELL,
    OCCUPATION_CELL_NAMES,
    PERSON_TYPE_CELLS,
    CensusTable,
    TABLE_SPECS,
)

PERSON_ALL, PERSON_MALE, PERSON_FEMALE = 0, 1, 2
PERSON_HOUSEHOLD, PERSON_COMMUNAL, PERSON_SCHOOLCHILD = 3, 4, 5


@dataclasses.dataclass
class CensusData:
    """Dense per-OA census aggregates, aligned on ``oa_codes``."""

    oa_codes: list[str]                    # sorted unique codes
    age_histogram: np.ndarray              # (n_oa, 101) int32
    occupation_counts: np.ndarray          # (n_oa, 9) int32
    population_counts: np.ndarray          # (n_oa, 6) int32 person types
    area_hectares: np.ndarray              # (n_oa,) float32
    density: np.ndarray                    # (n_oa,) float32
    # sparse commuting matrix in COO: home row index, work OA code string
    # kept separately because workplace OAs may lie outside the region
    commute_home: np.ndarray               # (nnz,) int32 row index
    commute_work_code: np.ndarray          # (nnz,) object: workplace OA code
    commute_count: np.ndarray              # (nnz,) int32

    @property
    def n_output_areas(self) -> int:
        return len(self.oa_codes)

    def index_of(self, code: str) -> int:
        import bisect

        i = bisect.bisect_left(self.oa_codes, code)
        if i == len(self.oa_codes) or self.oa_codes[i] != code:
            raise KeyError(code)
        return i

    # ------------------------------------------------------------------
    def filter_incomplete_output_areas(self) -> "CensusData":
        """Intersect OAs complete in all tables (lib.rs:393-446), and drop
        commuting entries whose workplace OA is outside the intersection."""
        ok = (
            (self.age_histogram.sum(axis=1) > 0)
            & (self.occupation_counts.sum(axis=1) > 0)
            & (self.population_counts[:, PERSON_ALL] > 0)
        )
        has_commute = np.zeros(self.n_output_areas, bool)
        has_commute[np.unique(self.commute_home)] = True
        ok &= has_commute

        keep = np.flatnonzero(ok)
        remap = -np.ones(self.n_output_areas, np.int64)
        remap[keep] = np.arange(len(keep))
        codes = [self.oa_codes[i] for i in keep]
        code_set = set(codes)

        cm_keep = remap[self.commute_home] >= 0
        cm_keep &= np.array(
            [c in code_set for c in self.commute_work_code], bool
        )
        return CensusData(
            oa_codes=codes,
            age_histogram=self.age_histogram[keep],
            occupation_counts=self.occupation_counts[keep],
            population_counts=self.population_counts[keep],
            area_hectares=self.area_hectares[keep],
            density=self.density[keep],
            commute_home=remap[self.commute_home[cm_keep]].astype(np.int32),
            commute_work_code=self.commute_work_code[cm_keep],
            commute_count=self.commute_count[cm_keep],
        )

    def commute_matrix(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """COO (home_idx, work_idx, count) with work codes resolved to local
        indices; entries with unknown work OAs are dropped."""
        idx = {c: i for i, c in enumerate(self.oa_codes)}
        work_idx = np.array(
            [idx.get(c, -1) for c in self.commute_work_code], np.int64
        )
        keep = work_idx >= 0
        return (
            self.commute_home[keep].astype(np.int64),
            work_idx[keep],
            self.commute_count[keep].astype(np.int64),
        )


# ---------------------------------------------------------------------------
# Long-format (NOMIS API download) parsers
# ---------------------------------------------------------------------------

def _read_csv(path: str) -> pd.DataFrame:
    return pd.read_csv(path, dtype=str, keep_default_na=False)


def parse_age_structure(path: str) -> pd.DataFrame:
    """-> DataFrame[code, age 0..100, count] (age_structure.rs:117-124)."""
    df = _read_csv(path)
    df = df[df["RURAL_URBAN_NAME"] == "Total"] if "RURAL_URBAN_NAME" in df else df
    age = df["C_AGE"].astype(int) - 1  # under-1 is C_AGE 1
    if (age > 100).any():
        raise OutOfBoundsError("age bin", 100, int(age.max()))
    return pd.DataFrame(
        {
            "code": df["GEOGRAPHY_NAME"],
            "age": age,
            "count": pd.to_numeric(df["OBS_VALUE"], errors="coerce")
            .fillna(0)
            .astype(int),
        }
    )


def parse_occupation(path: str) -> pd.DataFrame:
    df = _read_csv(path)
    if "MEASURES_NAME" in df:
        df = df[df["MEASURES_NAME"] == "Value"]
    df = df[df["CELL_NAME"] != OCCUPATION_ALL_CELL]
    occ = df["CELL_NAME"].map(OCCUPATION_CELL_NAMES)
    if occ.isna().any():
        bad = df["CELL_NAME"][occ.isna()].unique()[:5]
        raise MissingDataError(f"unknown occupation cells: {bad}")
    return pd.DataFrame(
        {
            "code": df["GEOGRAPHY_NAME"],
            "occupation": occ.astype(int),
            "count": pd.to_numeric(df["OBS_VALUE"], errors="coerce")
            .fillna(0)
            .astype(int),
        }
    )


def parse_population(path: str) -> pd.DataFrame:
    df = _read_csv(path)
    if "RURAL_URBAN_NAME" in df:
        df = df[df["RURAL_URBAN_NAME"] == "Total"]
    if "MEASURES_NAME" in df:
        df = df[df["MEASURES_NAME"] == "Value"]
    return pd.DataFrame(
        {
            "code": df["GEOGRAPHY_NAME"],
            "cell": df["CELL_NAME"],
            "value": pd.to_numeric(df["OBS_VALUE"], errors="coerce").fillna(0),
        }
    )


def parse_commuting(path: str, bulk: bool = False) -> pd.DataFrame:
    df = _read_csv(path)
    if bulk:
        home = df["Area of usual residence"]
        work = df["Area of workplace"]
        count = pd.to_numeric(df["count"], errors="coerce").fillna(0).astype(int)
    else:
        home = df["CURRENTLY_RESIDING_IN_CODE"]
        work = df["PLACE_OF_WORK_NAME"]
        count = (
            pd.to_numeric(df["OBS_VALUE"], errors="coerce").fillna(0).astype(int)
        )
    out = pd.DataFrame({"home": home, "work": work, "count": count})
    return out[out["count"] > 0]


def load_census_data(
    directory: str, *, bulk: bool = False, bulk_commuting: bool | None = None
) -> CensusData:
    """Read the four tables from ``directory`` and build aligned arrays.

    ``bulk=True`` reads the wide whole-England files (lib.rs:235-343 path,
    get_bulk_filename names) instead of the long NOMIS API downloads.
    """
    if bulk_commuting is None:
        bulk_commuting = bulk

    def path(table, use_bulk):
        spec = TABLE_SPECS[table]
        return os.path.join(
            directory, spec.bulk_filename if use_bulk else spec.filename
        )

    if bulk:
        from .bulk import parse_bulk_age, parse_bulk_occupation, parse_bulk_population

        ages = parse_bulk_age(path(CensusTable.AGE_STRUCTURE, True))
        occs = parse_bulk_occupation(path(CensusTable.OCCUPATION_COUNT, True))
        pops = parse_bulk_population(path(CensusTable.POPULATION_DENSITY, True))
    else:
        ages = parse_age_structure(path(CensusTable.AGE_STRUCTURE, False))
        occs = parse_occupation(path(CensusTable.OCCUPATION_COUNT, False))
        pops = parse_population(path(CensusTable.POPULATION_DENSITY, False))
    commute = parse_commuting(
        path(CensusTable.RESIDES_VS_WORKPLACE, bulk_commuting),
        bulk=bulk_commuting,
    )

    codes = sorted(
        set(ages["code"]) | set(occs["code"]) | set(pops["code"])
        | set(commute["home"])
    )
    idx = {c: i for i, c in enumerate(codes)}
    n = len(codes)

    age_h = np.zeros((n, 101), np.int32)
    rows = ages["code"].map(idx).to_numpy()
    np.add.at(age_h, (rows, ages["age"].to_numpy()), ages["count"].to_numpy())

    occ_c = np.zeros((n, 9), np.int32)
    rows = occs["code"].map(idx).to_numpy()
    np.add.at(
        occ_c, (rows, occs["occupation"].to_numpy()), occs["count"].to_numpy()
    )

    pop_c = np.zeros((n, 6), np.int32)
    area = np.zeros(n, np.float32)
    dens = np.zeros(n, np.float32)
    rows = pops["code"].map(idx).to_numpy()
    cells = pops["cell"].to_numpy()
    vals = pops["value"].to_numpy()
    for cell_name, col in PERSON_TYPE_CELLS.items():
        m = cells == cell_name
        pop_c[rows[m], col] = vals[m].astype(np.int32)
    m = cells == AREA_CELL
    area[rows[m]] = vals[m]
    m = cells == DENSITY_CELL
    dens[rows[m]] = vals[m]

    home_rows = commute["home"].map(idx).to_numpy()
    return CensusData(
        oa_codes=codes,
        age_histogram=age_h,
        occupation_counts=occ_c,
        population_counts=pop_c,
        area_hectares=area,
        density=dens,
        commute_home=home_rows.astype(np.int32),
        commute_work_code=commute["work"].to_numpy(dtype=object),
        commute_count=commute["count"].to_numpy().astype(np.int32),
    )
