"""Docs-vs-artifacts consistency gate (VERDICT r2 next #8).

Rounds 1 and 2 both shipped headline claims whose committed artifact said
otherwise (the ensemble64 summary, twice).  This test fails the suite when
any README/PERF/FIDELITY headline diverges from the sample_results artifact
that backs it.  Pure file parsing — no JAX, runs in milliseconds.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))


def test_doc_claims_match_artifacts():
    from artifacts_check import run_checks

    failures = run_checks(verbose=False)
    assert not failures, "\n".join(failures)


def test_front_page_claims():
    """VERDICT r3 weak #6: the README bench headline must quote the newest
    driver BENCH_r*.json, and every config knob citing docs/PERF.md must be
    named there (no dangling measurement citations)."""
    from artifacts_check import check_bench_headline, check_perf_citations

    failures = check_bench_headline(verbose=False)
    failures += check_perf_citations(verbose=False)
    assert not failures, "\n".join(failures)


def test_readme_test_count():
    """README's quoted test count matches live pytest collection (~17s)."""
    from artifacts_check import check_test_count

    failures = check_test_count(verbose=False)
    assert not failures, "\n".join(failures)
