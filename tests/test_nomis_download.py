"""NOMIS downloader: paging, retry, resume — with a mocked HTTP session
(nomis_download.rs:119-259 semantics; no network in this environment)."""

import numpy as np
import pytest

import epidemicsimulator_tpu.data.census.nomis as nomis
from epidemicsimulator_tpu.data.census.tables import CensusTable


class FakeResponse:
    def __init__(self, status, content=b""):
        self.status_code = status
        self.content = content


class FakeSession:
    """Serves `pages` in order; optional transient failures first."""

    def __init__(self, pages, failures=0):
        self.pages = pages
        self.failures = failures
        self.calls = []

    def get(self, url, timeout=None):
        self.calls.append(url)
        if self.failures > 0:
            self.failures -= 1
            return FakeResponse(500)
        # RecordOffset determines the page
        import re

        offset = int(re.search(r"RecordOffset=(\d+)", url).group(1))
        for page_offset, body in self.pages:
            if page_offset == offset:
                return FakeResponse(200, body)
        return FakeResponse(200, b"")


def _page(n_rows, header=True, start=0):
    rows = []
    if header:
        rows.append("GEOGRAPHY_NAME,C_AGE,OBS_VALUE")
    rows += [f"E{start + i:08d},1,5" for i in range(n_rows)]
    return ("\n".join(rows) + "\n").encode()


def test_single_page_download(tmp_path, monkeypatch):
    monkeypatch.setattr(nomis, "PAGE_SIZE", 100)
    sess = FakeSession([(0, _page(10))])
    dest = str(tmp_path / "t.csv")
    nomis.download_table(CensusTable.AGE_STRUCTURE, "TYPE299", dest, session=sess)
    body = open(dest).read()
    assert body.count("\n") == 11  # header + 10 rows
    assert len(sess.calls) == 1


def test_multi_page_download(tmp_path, monkeypatch):
    monkeypatch.setattr(nomis, "PAGE_SIZE", 10)
    # page sizes: full page (11 lines incl header > PAGE_SIZE rows semantics):
    # downloader pages until a short page arrives
    pages = [(0, _page(10)), (11, _page(4, header=False, start=10))]
    sess = FakeSession(pages)
    dest = str(tmp_path / "t.csv")
    nomis.download_table(CensusTable.AGE_STRUCTURE, "TYPE299", dest, session=sess)
    assert len(sess.calls) == 2
    body = open(dest).read()
    assert "E00000013" in body


def test_retry_then_success(tmp_path, monkeypatch):
    monkeypatch.setattr(nomis, "PAGE_SIZE", 100)
    sess = FakeSession([(0, _page(3))], failures=2)  # 2 transient 500s
    dest = str(tmp_path / "t.csv")
    nomis.download_table(CensusTable.AGE_STRUCTURE, "TYPE299", dest, session=sess)
    assert len(sess.calls) == 3  # 2 failures + 1 success


def test_retries_exhausted(tmp_path, monkeypatch):
    monkeypatch.setattr(nomis, "PAGE_SIZE", 100)
    sess = FakeSession([(0, _page(3))], failures=5)
    with pytest.raises(RuntimeError, match="retries"):
        nomis.download_table(
            CensusTable.AGE_STRUCTURE, "TYPE299", str(tmp_path / "t.csv"),
            session=sess,
        )


def test_resume_appends(tmp_path, monkeypatch):
    monkeypatch.setattr(nomis, "PAGE_SIZE", 100)
    dest = tmp_path / "t.csv"
    dest.write_text("GEOGRAPHY_NAME,C_AGE,OBS_VALUE\nE00000000,1,5\n")
    sess = FakeSession([(1, _page(2, header=False, start=1))])
    nomis.download_table(
        CensusTable.AGE_STRUCTURE, "TYPE299", str(dest),
        resume_from_row=1, session=sess,
    )
    body = dest.read_text()
    assert body.count("\n") == 4  # header + 3 data rows
    assert "RecordOffset=1" in sess.calls[0]
