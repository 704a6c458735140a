"""Mechanical guards over EVERY queries() plan (VERDICT r2 item 10):
the two solved failure classes must not silently return.

* rounding flake: Spark's BigDecimal HALF_UP round() disagrees with
  DuckDB's at double boundaries, so no oracle-checked query may round
  an aggregated double (the money queries sum exact integer cents
  instead). ``round(sum(`` in a plan is the signature of a regression.
* quadratic join: a BroadcastNestedLoopJoin / CartesianProduct in a
  plan means a join lost its equi-condition — the class of bug the
  chunk/grid/LSH blocking exists to prevent.
"""

import re

import __spark_entry__ as em

#: queries whose cross-product is INTENTIONAL and bounded:
#: - sim_topk: brute-force all-pairs IS the baseline being offered
#:   (queries-side is a 10-row broadcast; the scale path is ivf/lsh)
#: - ivf_seeded: every vector scores against the 16-row broadcast
#:   centroid table — a bounded fan-out, not a pair explosion
#: sanctioned tiny-broadcast fusions only: sim_topk/ivf_seeded/
#: ann_recall broadcast the bounded query/centroid set; skew_report
#: broadcasts one single-row totals aggregate; temperature_mix
#: attaches its single-row (total-weight, total-rows) aggregate to
#: the tiny per-source counts table (the rates table itself joins
#: back by hash, not cross)
#: kmeans / cluster_balance broadcast the ≤k-row centroid table each
#: Lloyd round — bounded fan-out, not a pair explosion
#: ccnet_buckets broadcasts its single-row 2-quantile threshold;
#: kcenter broadcasts one single-row center/max per greedy round;
#: tpch_q11_share broadcasts its single-row (total, n) scalar;
#: rfm broadcasts the single-row corpus-max date and the single-row
#: 6-value tercile thresholds;
#: pq_topk broadcasts its single-row packed codebook (m·k entries,
#: r13 in-row argmin — the same bounded fan-out as kmeans's packed
#: centroid row, never data-sized)
CROSS_JOIN_OK = {"sim_topk", "ivf_seeded", "ivf2_seeded", "ann_recall",
                 "skew_report", "temperature_mix", "kmeans",
                 "cluster_balance", "ccnet_buckets", "kcenter",
                 "tpch_q11_share", "rfm", "pq_topk"}


def test_no_unexpected_cross_join_or_rounded_sum(spark):
    sf = "/root/testdata/sf0.001"
    bad_join, bad_round, built = [], [], 0
    for name, fn in sorted(em.queries().items()):
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        built += 1
        if ("BroadcastNestedLoop" in plan or "CartesianProduct" in plan) \
                and name not in CROSS_JOIN_OK:
            bad_join.append(name)
        if re.search(r"round\(sum\(", plan):
            bad_round.append(name)
    assert not bad_join, f"unexpected cross join in: {bad_join}"
    assert not bad_round, f"round over an aggregate in: {bad_round}"
    assert built == len(em.queries())  # every query's plan was built


def test_take_drop_while_have_no_global_window(spark):
    """take_while/drop_while must use the two-pass scalar cutoff
    (top-1 + broadcast filter), never the unpartitioned-window latch —
    a single-partition sort at scale (VERDICT r4 item 4)."""
    sf = "/root/testdata/sf0.001"
    for name in ("take_while", "drop_while"):
        plan = em.queries()[name](spark, sf)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Window" not in plan, f"{name}: global-window latch is back"
        assert "TakeOrderedAndProject" in plan, f"{name}: cutoff not top-1"


def test_group_quota_windows_are_bucket_partitioned(spark):
    """cap_per_group / token_budget_mix must use the bucket-prefix-sum
    scalar cutoff (VERDICT r5 item 1): the data-scale window (the one
    with a current-row frame that ranks/sums actual rows) must be
    partitioned by (group, __cp_bkt__) — a window keyed by the group
    alone serializes each source into one task at 100 TB. The
    group-only prefix window is allowed because its input is the tiny
    (group, bucket) aggregate, which the HashAggregate assertion pins."""
    sf = "/root/testdata/sf0.001"
    for name in ("lang_cap", "token_budget_mix", "global_shuffle",
                 "quality_topfrac"):
        plan = em.queries()[name](spark, sf)._jdf.queryExecution() \
            .executedPlan().toString()
        data_windows = [
            ln for ln in plan.splitlines()
            if "windowspecdefinition" in ln and "currentrow$()" in ln
        ]
        assert data_windows, f"{name}: no data-scale window found"
        for ln in data_windows:
            assert "__cp_bkt__" in ln, \
                f"{name}: group-only window over full data is back: {ln.strip()[:160]}"
        # offsets come back via a broadcast equi-join of the tiny
        # aggregated bucket table — never a shuffled or nested-loop join
        assert "BroadcastHashJoin" in plan, f"{name}: offset join not broadcast"
        assert "HashAggregate" in plan, f"{name}: bucket pre-aggregate missing"


def test_brute_force_topk_has_chunked_prefilter(spark):
    """sim_topk must reduce per (query, corpus-chunk) before the global
    per-query window (VERDICT r5 item 2) — the single-window form sorts
    the whole scored table in |queries| tasks at scale."""
    sf = "/root/testdata/sf0.001"
    plan = em.queries()["sim_topk"](spark, sf)._jdf.queryExecution() \
        .executedPlan().toString()
    data_windows = [ln for ln in plan.splitlines()
                    if "windowspecdefinition" in ln]
    chunked = [ln for ln in data_windows if "__chunk__" in ln]
    assert chunked, "pre-top-k chunk window missing from sim_topk plan"
    # the chunk window must sit BELOW the final query_id-only window
    # (i.e. appear later in the bottom-up printed plan text)
    assert plan.find(chunked[-1]) > min(plan.find(ln) for ln in data_windows
                                        if ln not in chunked), \
        "chunk window is not the first (inner) top-k stage"


def test_stream_batch_ts_schema_parity(spark, tmp_path):
    """The streaming and batch events readers must surface the SAME ts
    dtype — they share normalize_timestamps, and this guard goes red if
    either path grows private schema logic again (the r4 µs regression:
    batch learned the new footer precision, streaming didn't)."""
    import shutil

    from csvplus_spark import load_table
    from csvplus_spark.streaming.events import stream_events

    sf = "/root/testdata/sf0.001"
    src = tmp_path / "ev_parity"
    src.mkdir()
    shutil.copy(f"{sf}/events.parquet", src / "part-0.parquet")
    batch_ts = load_table(spark, sf, "events").df.schema["ts"].dataType
    stream_ts = stream_events(spark, str(src)).schema["ts"].dataType
    assert stream_ts == batch_ts, (stream_ts, batch_ts)


def test_cross_join_allowlist_is_tight(spark):
    """The allowlisted queries really do contain the pattern — if one
    stops needing its exemption, shrink CROSS_JOIN_OK."""
    sf = "/root/testdata/sf0.001"
    for name in sorted(CROSS_JOIN_OK):
        plan = em.queries()[name](spark, sf)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastNestedLoop" in plan or "CartesianProduct" in plan, name


def test_bench_line_stays_under_driver_tail_budget():
    """Regression pin for the r6 bench-parse outage: the driver keeps
    only the last 2000 chars of stdout, so the bench line must stay
    under budget for the FULL headline set — and for a hypothetical
    3x-grown set the guard must elide fastest-first with an explicit
    omitted count rather than overflow."""
    import json

    from bench import HEADLINE, format_bench_line

    timings = {n: 123.456 for n in HEADLINE}
    line = format_bench_line(timings, 999.999, 0.1)
    assert len(line) <= 1900
    parsed = json.loads(line)
    # the full set fits while it fits; once HEADLINE outgrows the
    # budget the guard elides fastest-first and ACCOUNTS for it — the
    # invariant is parse-ability + accounting, not zero elision
    kept = set(parsed["queries"])
    assert kept <= set(HEADLINE)
    assert len(kept) + parsed.get("queries_omitted", 0) == len(HEADLINE)
    # the driver must still see the overwhelming majority of queries
    assert len(kept) >= min(len(HEADLINE), 60)

    big = {f"query_with_a_rather_long_name_{i:03d}": float(i)
           for i in range(220)}
    line2 = format_bench_line(big, 1.0, 0.1)
    assert len(line2) <= 1900
    parsed2 = json.loads(line2)
    assert parsed2["queries_omitted"] == 220 - len(parsed2["queries"])
    # slowest entries survive the cut
    kept = parsed2["queries"]
    assert "query_with_a_rather_long_name_219" in kept
    assert "query_with_a_rather_long_name_000" not in kept


def test_raw_graph_duplication_guard(spark):
    """require_low_duplication: the raw-graph pre-flight (VERDICT r8
    item 2). A high-duplication corpus must raise GraphScaleError with
    route-to-_reps guidance BEFORE the pair pipeline runs; a
    low-duplication corpus passes through unchanged."""
    import pyspark.sql.functions as F

    from csvplus_spark.operators.graph import (GraphScaleError,
                                               duplication_factor,
                                               require_low_duplication)

    # engineered f=50 corpus: one text repeated 50x + 2 uniques
    rows = [(i, "the same boilerplate text repeated") for i in range(50)]
    rows += [(100, "unique alpha"), (101, "unique beta")]
    high = spark.createDataFrame(rows, "doc_id long, text string")
    assert duplication_factor(high) > 15
    try:
        require_low_duplication(high, operator="pagerank")
        assert False, "high-f corpus must raise"
    except GraphScaleError as e:
        msg = str(e)
        assert "pagerank" in msg and "_reps" in msg
        assert "exact dedup" in msg.lower() or "exact_dedup" in msg

    # low-f corpus passes through as the SAME plan (chainable)
    low = spark.createDataFrame(
        [(i, f"document number {i} body") for i in range(20)],
        "doc_id long, text string")
    out = require_low_duplication(low, operator="pagerank")
    assert out is low
    # factor exactly 1.0 on an all-unique corpus
    assert duplication_factor(low) == 1.0

    # empty corpus: no division blow-up, passes
    empty = low.filter(F.lit(False))
    assert duplication_factor(empty) == 1.0
    assert require_low_duplication(empty) is empty
