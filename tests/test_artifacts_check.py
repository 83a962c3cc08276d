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
