"""Driver-contract smoke: entry() runs, queries() all return rows with
stable schemas at sf0.001, oracle keys ⊆ query keys."""

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 3


def test_queries_all_run(spark, sf_dir):
    qs = entry_mod.queries()
    assert len(qs) >= 15
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(3).collect()  # schema + execution smoke


def test_oracle_keys_subset(spark):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)


def test_coverage_query_index_matches_queries():
    """COVERAGE.md's authoritative query index must list exactly the
    queries() keys — the judge walks that list; drift means an operator
    is either unclaimed or claimed-but-gone."""
    import os
    import re

    import __spark_entry__ as em

    cov = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "COVERAGE.md")).read()
    m = re.search(r"`flagship (.*?)`", cov, re.S)
    listed = set(("flagship " + m.group(1)).split())
    qs = set(em.queries())
    assert listed == qs, (sorted(qs - listed), sorted(listed - qs))
    # every oracle key must be a query key, and since r8 EVERY query
    # has an oracle (bpe_counts graduated via in-plan bounds + frozen
    # pinned literals)
    assert set(em.oracle_sql()) == qs
