"""Doc-vs-registry consistency gate: the README/COVERAGE headline counts
are hand-written prose; this asserts they match the LIVE query registry
and test suite so the docs can never silently drift from the code.

Usage: python tools/consistency_check.py   (exits non-zero on drift)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    n_q, n_o, n_rows_only = len(q), len(o), len(q) - len(o)

    failures: list[str] = []

    readme = open(os.path.join(REPO, "README.md")).read()
    coverage = open(os.path.join(REPO, "COVERAGE.md")).read()

    def expect(doc_name: str, text: str, pattern: str, what: str) -> None:
        if not re.search(pattern, text):
            failures.append(f"{doc_name}: expected {what} (pattern {pattern!r})")

    expect("README", readme, rf"{n_q} declared queries — {n_o} with DuckDB", "query/oracle counts")
    expect("README", readme, rf"the {n_rows_only} rows-only queries", "rows-only count")
    expect("COVERAGE", coverage, rf"{n_q} declared queries — {n_o} DuckDB-oracle-checked, {n_rows_only} rows-only", "totals line")

    # pytest count: collect-only is cheap (no Spark session)
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--collect-only"],
        capture_output=True, text=True, cwd=REPO,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        failures.append("could not count tests via pytest --collect-only")
    else:
        n_tests = int(m.group(1))
        expect("README", readme, rf"{n_tests} pytest tests", "pytest count in status block")
        expect("README", readme, rf"pytest suite \({n_tests} tests\)", "pytest count in layout block")

    # every declared query name that COVERAGE claims an oracle for must
    # actually have one (spot direction: names in the registry)
    for name in q:
        if name not in coverage and name not in ("",):
            failures.append(f"COVERAGE: declared query {name!r} never mentioned")

    if failures:
        print("CONSISTENCY FAILURES:")
        for f in failures:
            print(" ", f)
        sys.exit(1)
    print(
        f"CONSISTENCY OK: {n_q} queries ({n_o} oracle / {n_rows_only} rows-only), "
        f"docs and registry agree"
    )


if __name__ == "__main__":
    main()
