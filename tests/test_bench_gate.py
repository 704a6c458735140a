"""Automated per-query bench regression gate (r7 verdict item 3):
BENCH_HISTORY.jsonl was previously write-only — the r2 and r6 timing
regressions were both caught only by manual A/B. This runs the same
comparison tools/check_bench_regression.py exposes, inside the
ordinary pytest sweep, and fails the suite on a >1.5× slowdown of any
shared ≥0.5s query between the two most recent bench runs."""

import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))

from check_bench_regression import (compare, effective_threshold,
                                    load_history, median_baseline,
                                    noise_band, same_tree, trend_table)


#: deliberate slowdowns, waived with a reason and pruned next round —
#: a query whose SEMANTICS changed does more work on purpose; an entry
#: here is an explicit, auditable decision, never a silent cap.
#: (r12: the r8 bpe_counts and r9 training_set waivers pruned per this
#: policy — both now sit inside the gate against current history.)
EXPECTED_SLOWDOWNS: dict[str, str] = {}


def test_no_per_query_bench_regression():
    hist = load_history()
    if len(hist) < 2:
        pytest.skip("bench history has <2 runs")
    cur = hist[-1]
    window = hist[-4:-1]
    # r11 verdict item 1: runs at the same clean git SHA are the same
    # source tree — an identical tree cannot regress, its spread is
    # noise calibration (feeds effective_threshold), never a failure
    if window and all(same_tree(e, cur) for e in window):
        pytest.skip("baseline window shares the current run's SHA: "
                    "identical source, spread is noise not regression")
    # baseline = per-query MEDIAN of the last 3 runs: one anomalously
    # fast run must not flag the next normal run (winnow r8); the
    # threshold is derived from the measured same-tree spread
    thr = effective_threshold(hist)
    regressions, table = compare(median_baseline(hist), cur,
                                 threshold=thr)
    regressions = [r for r in regressions
                   if r["query"] not in EXPECTED_SLOWDOWNS]
    assert not regressions, (
        f"\n(threshold {thr}x = max(static 1.5, measured same-tree "
        f"noise {noise_band(hist)['worst']}x * 1.05))\n"
        + trend_table(table) + "\nregressions: "
        + ", ".join(f"{r['query']} {r['base']}s->{r['cur']}s"
                    for r in regressions))


def test_same_sha_exemption_and_noise_band():
    """Unit-pin the SHA semantics (r11 verdict item 1): clean same-SHA
    runs are the same tree (exempt + feed the noise band); dirty or
    missing SHAs never match; the effective threshold tracks the worst
    same-tree spread with margin but never drops below the static
    1.5x."""
    a = {"git_sha": "abc", "sf": 0.1,
         "queries": {"q1": 1.0, "q2": 2.0, "tiny": 0.1}}
    b = {"git_sha": "abc", "sf": 0.1,
         "queries": {"q1": 1.7, "q2": 2.2, "tiny": 0.4}}
    c = {"git_sha": "def", "sf": 0.1, "queries": {"q1": 1.0}}
    d = {"git_sha": "abc-dirty", "sf": 0.1, "queries": {"q1": 1.0}}
    e = {"sf": 0.1, "queries": {"q1": 1.0}}  # legacy row, no SHA
    assert same_tree(a, b)
    assert not same_tree(a, c)
    assert not same_tree(d, d)   # dirty trees are never provably same
    assert not same_tree(e, e)   # unknown SHAs never match
    band = noise_band([a, b, c, d, e])
    # worst same-tree ratio: q1 1.7x (tiny is under the 0.5s floor)
    assert band["worst"] == 1.7 and band["query"] == "q1"
    assert effective_threshold([a, b, c]) == round(1.7 * 1.05, 3)
    # with no same-SHA pairs the static threshold stands
    assert effective_threshold([c, d, e]) == 1.5


def test_compare_logic():
    """Unit-pin the gate's semantics: floor, threshold, shared-only,
    failed (-1) timings skipped."""
    base = {"queries": {"a": 1.0, "b": 0.2, "c": 2.0, "d": 1.0, "gone": 1.0}}
    cur = {"queries": {"a": 1.6, "b": 0.9, "c": -1.0, "d": 1.4, "new": 9.9}}
    regressions, table = compare(base, cur)
    names = {r["query"] for r in regressions}
    assert names == {"a"}          # 1.6x on a >=0.5s query
    # b regressed 4.5x but base < floor; c failed (skipped); d is 1.4x
    assert {r["query"] for r in table} == {"a", "b", "d"}


def test_headline_covers_every_query():
    """No silent caps (r7 verdict 6): every queries() entry has a
    timing row in bench.py's HEADLINE set, except the explicitly
    documented exclusions (each with a reason in bench.py)."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    import bench
    import __spark_entry__ as em

    DOCUMENTED_EXCLUSIONS = {
        # data-quadratic OUTPUT (~n²/6 rows on template corpora): its
        # timing measures output materialization, not plan quality —
        # the linear simhash_pairs60/simhash_reps60 shapes are timed
        "simhash_pairs",
    }
    qs = set(em.queries())
    hs = set(bench.HEADLINE)
    assert len(bench.HEADLINE) == len(hs), "duplicate HEADLINE entry"
    assert hs <= qs, sorted(hs - qs)
    assert qs - hs == DOCUMENTED_EXCLUSIONS, sorted(qs - hs)


def test_median_baseline_absorbs_outlier_run():
    """One lucky (fast) run in the window must not flag the next
    normal run; a persistent slowdown still flags."""
    hist = [{"queries": {"a": 1.0, "b": 1.0}, "value": 2.0},
            {"queries": {"a": 1.1, "b": 1.0}, "value": 2.1},
            {"queries": {"a": 0.5, "b": 1.0}, "value": 1.5},  # outlier
            {"queries": {"a": 1.05, "b": 2.0}, "value": 3.05}]
    base = median_baseline(hist)
    assert base["queries"]["a"] == 1.0   # median(1.0, 1.1, 0.5)
    regressions, _ = compare(base, hist[-1])
    names = {r["query"] for r in regressions}
    assert names == {"b"}  # real 2x persists; a's 1.05/1.0 passes


def test_rotated_out_queries_stay_green_in_local_sweep():
    """ADVICE r8: the driver window rotation must not turn past driver
    coverage into advisory-only coverage — every query that EVER
    earned a driver-green row must stay hash-green in the newest
    committed local full sweep. (Queries newer than the sweep artifact
    have no baseline and are skipped by the helper.)"""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tools"))
    import rotation_status

    assert rotation_status.latest_local_sweep() is not None, \
        "no committed local sweep artifact found"
    bad = rotation_status.rotated_out_regressions()
    assert bad == [], f"previously driver-green queries now red: {bad}"
