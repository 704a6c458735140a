"""COVERAGE.md ↔ queries() sync gate (round-11 verdict item 5).

COVERAGE.md's "Query index" section is the authoritative
human-readable index of every gate query; round 10 shipped it with a
stale prose count ("172 entries" while ``queries()`` held 176). This
gate parses BOTH the prose counts and the backticked name list out of
COVERAGE.md and asserts they match ``__spark_entry__.queries()``
exactly, so the doc can't drift from the code again.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _coverage_text() -> str:
    return open(os.path.join(ROOT, "COVERAGE.md")).read()


def _query_names() -> list[str]:
    import __spark_entry__ as e

    return list(e.queries())


def test_coverage_query_index_names_match_queries():
    txt = _coverage_text()
    m = re.search(r"## Query index.*?:\n\n`(.*?)`", txt, re.S)
    assert m, "COVERAGE.md: Query index name list not found"
    names = m.group(1).split()
    qs = _query_names()
    assert sorted(names) == sorted(qs), (
        f"COVERAGE.md name list out of sync: "
        f"missing={sorted(set(qs) - set(names))} "
        f"extra={sorted(set(names) - set(qs))}")


def test_coverage_query_index_counts_match_queries():
    txt = _coverage_text()
    sect = txt[txt.index("## Query index"):]
    counts = [int(n) for n in re.findall(r"(\d+) entries", sect)]
    assert counts, "COVERAGE.md: no 'N entries' counts found"
    n = len(_query_names())
    assert all(c == n for c in counts), (
        f"COVERAGE.md says {counts} entries but queries() has {n}")
