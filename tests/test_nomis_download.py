"""NOMIS downloader: paging, retry, resume — against a faithful fake server
(nomis_download.rs:119-259 semantics; no network in this environment).

The fake server emulates the NOMIS API surface the downloader relies on:
rows served by exact RecordOffset/recordlimit, the CSV header included only
when ExcludeColumnHeadings is absent, and an empty body past the end of the
table (which is the loop-exit signal, nomis_download.rs:253-256).
"""

import re

import pytest

import epidemicsimulator_tpu.data.census.nomis as nomis
from epidemicsimulator_tpu.data.census.tables import CensusTable
from epidemicsimulator_tpu.errors import NetworkError

HEADER = "GEOGRAPHY_NAME,C_AGE,OBS_VALUE"


def _row(i):
    return f"E{i:08d},1,5"


class FakeNomisServer:
    """Serves a `n_rows`-row table with exact offset/limit paging."""

    def __init__(self, n_rows, failures=0):
        self.n_rows = n_rows
        self.failures = failures
        self.calls = []

    def get(self, url, timeout=None):
        self.calls.append(url)
        if self.failures > 0:
            self.failures -= 1
            return FakeResponse(500)
        offset = int(re.search(r"RecordOffset=(\d+)", url).group(1))
        limit = int(re.search(r"recordlimit=(\d+)", url).group(1))
        exclude_header = "ExcludeColumnHeadings=true" in url
        rows = [_row(i) for i in range(offset, min(offset + limit, self.n_rows))]
        if not rows:
            return FakeResponse(200, b"")  # past the end -> empty body
        lines = ([] if exclude_header else [HEADER]) + rows
        return FakeResponse(200, ("\n".join(lines) + "\n").encode())


class FakeResponse:
    def __init__(self, status, content=b""):
        self.status_code = status
        self.content = content


def _expected_csv(n_rows):
    return "\n".join([HEADER] + [_row(i) for i in range(n_rows)]) + "\n"


def test_single_page_download(tmp_path, monkeypatch):
    monkeypatch.setattr(nomis, "PAGE_SIZE", 100)
    sess = FakeNomisServer(10)
    dest = str(tmp_path / "t.csv")
    nomis.download_table(CensusTable.AGE_STRUCTURE, "TYPE299", dest, session=sess)
    assert open(dest).read() == _expected_csv(10)
    # a 10-row table under a 100-row page: page 0 (short) + page 1 (empty)
    assert len(sess.calls) == 2
    assert "RecordOffset=0" in sess.calls[0]
    assert "ExcludeColumnHeadings" not in sess.calls[0]


def test_three_page_download_byte_for_byte(tmp_path, monkeypatch):
    monkeypatch.setattr(nomis, "PAGE_SIZE", 10)
    sess = FakeNomisServer(25)  # pages of 10, 10, 5 then empty
    dest = str(tmp_path / "t.csv")
    nomis.download_table(CensusTable.AGE_STRUCTURE, "TYPE299", dest, session=sess)
    assert open(dest).read() == _expected_csv(25)
    # offsets are exact index * PAGE_SIZE (nomis_download.rs:231-232)
    offsets = [int(re.search(r"RecordOffset=(\d+)", u).group(1)) for u in sess.calls]
    assert offsets == [0, 10, 20, 30]
    # continuation pages ask the server to strip the header (:233-234)
    assert "ExcludeColumnHeadings" not in sess.calls[0]
    assert all("ExcludeColumnHeadings=true" in u for u in sess.calls[1:])


def test_exact_multiple_of_page_size(tmp_path, monkeypatch):
    # 20 rows / 10-row pages: two full pages, then the empty-body exit
    monkeypatch.setattr(nomis, "PAGE_SIZE", 10)
    sess = FakeNomisServer(20)
    dest = str(tmp_path / "t.csv")
    nomis.download_table(CensusTable.AGE_STRUCTURE, "TYPE299", dest, session=sess)
    assert open(dest).read() == _expected_csv(20)
    assert len(sess.calls) == 3


def test_retry_then_success(tmp_path, monkeypatch):
    monkeypatch.setattr(nomis, "PAGE_SIZE", 100)
    sess = FakeNomisServer(3, failures=2)  # 2 transient 500s
    dest = str(tmp_path / "t.csv")
    nomis.download_table(CensusTable.AGE_STRUCTURE, "TYPE299", dest, session=sess)
    assert open(dest).read() == _expected_csv(3)
    assert len(sess.calls) == 4  # 2 failures + success + empty-body exit


def test_retries_exhausted(tmp_path, monkeypatch):
    monkeypatch.setattr(nomis, "PAGE_SIZE", 100)
    sess = FakeNomisServer(3, failures=5)
    with pytest.raises(NetworkError, match="retries"):
        nomis.download_table(
            CensusTable.AGE_STRUCTURE, "TYPE299", str(tmp_path / "t.csv"),
            session=sess,
        )


def test_resume_appends_from_page_boundary(tmp_path, monkeypatch):
    """--resume row N restarts at page N // PAGE_SIZE and appends
    (run/src/main.rs:200-211, nomis_download.rs:148-152, :171-175)."""
    monkeypatch.setattr(nomis, "PAGE_SIZE", 10)
    dest = tmp_path / "t.csv"
    # the first download got through page 0 (header + rows 0..9) and died
    dest.write_text(_expected_csv(10))
    sess = FakeNomisServer(25)
    nomis.download_table(
        CensusTable.AGE_STRUCTURE, "TYPE299", str(dest),
        resume_from_row=10, session=sess,
    )
    assert dest.read_text() == _expected_csv(25)
    offsets = [int(re.search(r"RecordOffset=(\d+)", u).group(1)) for u in sess.calls]
    assert offsets == [10, 20, 30]
    # resumed pages never carry a header (index != 0)
    assert all("ExcludeColumnHeadings=true" in u for u in sess.calls)


def test_resume_mid_page_rounds_down_to_page(tmp_path, monkeypatch):
    """Resume granularity is the page, exactly like the reference
    (index = resume_from_record / PAGE_SIZE, nomis_download.rs:148-152)."""
    monkeypatch.setattr(nomis, "PAGE_SIZE", 10)
    dest = tmp_path / "t.csv"
    dest.write_text(_expected_csv(10))
    sess = FakeNomisServer(25)
    nomis.download_table(
        CensusTable.AGE_STRUCTURE, "TYPE299", str(dest),
        resume_from_row=15, session=sess,
    )
    offsets = [int(re.search(r"RecordOffset=(\d+)", u).group(1)) for u in sess.calls]
    assert offsets[0] == 10  # floor(15 / 10) * 10
