"""NOMIS census-table downloader: paged CSV fetch with retry and resume.

Equivalent of `load_census_data/src/nomis_download.rs`: 1,000,000-row pages
(nomis_download.rs:43 PAGE_SIZE), up to 3 retries per page (:46), resumable
from a row offset (:119-180), API key from the NOMIS_API_KEY env var (dotenv
supported by simply exporting it).  Geography codes for the areas the
reference ships (:274-314).
"""

from __future__ import annotations

import logging
import os
import time

from .tables import CensusTable, TABLE_SPECS

log = logging.getLogger(__name__)

NOMIS_API = "https://www.nomisweb.co.uk/api/v01/dataset"
PAGE_SIZE = 1_000_000
MAX_RETRIES = 3

# Geography code ranges per area (nomis_download.rs:274-314).
GEOGRAPHY_CODES = {
    "1946157112": "1254162148...1254162748,1254262205...1254262240",  # York
    "2013265923": "1254132824...1254159668,1254258198...1254261743",  # Yorkshire & Humber
    "2092957699": "TYPE299",  # England (all OAs)
}


def table_url(table: CensusTable, geography: str, offset: int = 0) -> str:
    spec = TABLE_SPECS[table]
    params = [
        f"geography={geography}",
        f"recordlimit={PAGE_SIZE}",
        f"RecordOffset={offset}",
    ]
    if spec.api_columns:
        params.append(f"select={spec.api_columns}")
    key = os.environ.get("NOMIS_API_KEY")
    if key:
        params.append(f"uid={key}")
    return f"{NOMIS_API}/{spec.api_code}.data.csv?" + "&".join(params)


def download_table(
    table: CensusTable,
    geography: str,
    dest_path: str,
    *,
    resume_from_row: int = 0,
    session=None,
) -> str:
    """Download all pages of ``table`` into ``dest_path``.

    Appends when resuming (run/src/main.rs:200-211 --resume semantics).
    Raises RuntimeError after MAX_RETRIES failures on a page.
    """
    import requests

    sess = session or requests.Session()
    offset = resume_from_row
    mode = "ab" if resume_from_row else "wb"
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)

    # Continuation pages repeat the CSV header; strip it when it matches the
    # header we already have (from the existing file on resume, or the first
    # page otherwise).
    header_line: bytes | None = None
    if resume_from_row and os.path.exists(dest_path):
        with open(dest_path, "rb") as f0:
            header_line = f0.readline().rstrip(b"\r\n")

    with open(dest_path, mode) as f:
        first_page = True
        while True:
            url = table_url(table, geography, offset)
            body = _fetch_with_retry(sess, url)
            if not body:
                break
            first_nl = body.find(b"\n")
            page_first = body[:first_nl].rstrip(b"\r") if first_nl >= 0 else body
            if header_line is None:
                header_line = page_first
            elif not first_page or resume_from_row:
                if page_first == header_line:
                    body = body[first_nl + 1 :]
            f.write(body)
            first_page = False
            n_rows = body.count(b"\n")
            log.info("fetched %d rows at offset %d for %s", n_rows, offset, table)
            if n_rows < PAGE_SIZE:
                break
            offset += n_rows
    return dest_path


def _fetch_with_retry(sess, url: str) -> bytes:
    last = None
    for attempt in range(MAX_RETRIES):
        try:
            r = sess.get(url, timeout=300)
            if r.status_code == 200:
                return r.content
            last = RuntimeError(f"HTTP {r.status_code}")
        except Exception as e:  # noqa: BLE001
            last = e
        time.sleep(2**attempt)
    raise RuntimeError(f"download failed after {MAX_RETRIES} retries: {last}")


def download_all_tables(directory: str, area: str) -> None:
    geography = GEOGRAPHY_CODES.get(area, area)
    for table in (
        CensusTable.AGE_STRUCTURE,
        CensusTable.OCCUPATION_COUNT,
        CensusTable.POPULATION_DENSITY,
        CensusTable.RESIDES_VS_WORKPLACE,
    ):
        dest = os.path.join(directory, TABLE_SPECS[table].filename)
        if os.path.exists(dest):
            log.info("%s already present, skipping", dest)
            continue
        download_table(table, geography, dest)
