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

from check_bench_regression import (box_speed_ratio, compare,
                                    effective_threshold,
                                    effective_thresholds,
                                    load_history, median_baseline,
                                    noise_band, same_tree,
                                    scaled_thresholds, trend_table)


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
    # noise calibration (feeds effective_thresholds), never a failure
    if window and all(same_tree(e, cur) for e in window):
        pytest.skip("baseline window shares the current run's SHA: "
                    "identical source, spread is noise not regression")
    # baseline = per-query MEDIAN of the last 3 runs: one anomalously
    # fast run must not flag the next normal run (winnow r8); each
    # query gates at its OWN measured same-tree spread (p90 of the
    # spread distribution when it has no sample), windowed to the
    # newest CALIBRATION_WINDOW rows (r12 ADVICE item 2)
    # thresholds additionally scale by the measured box-speed ratio
    # (r13: the cpu_yardstick stamped in each row isolates host
    # slowdown — identical pure-CPU work taking 1.4x longer means the
    # BOX changed, not the source)
    thr, per_q, box = scaled_thresholds(hist)
    regressions, table = compare(median_baseline(hist), cur,
                                 threshold=thr, per_query=per_q)
    regressions = [r for r in regressions
                   if r["query"] not in EXPECTED_SLOWDOWNS]
    assert not regressions, (
        f"\n(default gate {thr}x = max(static 1.5, p90 same-tree "
        f"noise {noise_band(hist)['p90']}x * 1.05) x box-speed "
        f"factor {box}; per-query gates from each query's own "
        f"spread)\n"
        + trend_table(table) + "\nregressions: "
        + ", ".join(f"{r['query']} {r['base']}s->{r['cur']}s "
                    f"(gate {r['threshold']}x)"
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
    # r12 ADVICE item 2: PER-QUERY calibration — q2's gate comes from
    # q2's own 1.1x spread, not q1's outlier
    assert band["per_query"] == {"q1": 1.7, "q2": 1.1}
    thr, per_q = effective_thresholds([a, b, c])
    assert per_q["q1"] == round(1.7 * 1.05, 3)
    assert per_q["q2"] == 1.5           # own spread 1.155 < static floor
    # default (no own sample) = p90 of the spread distribution
    assert thr == round(band["p90"] * 1.05, 3)
    # with no same-SHA pairs the static threshold stands everywhere
    assert effective_thresholds([c, d, e]) == (1.5, {})
    assert effective_threshold([c, d, e]) == 1.5


def test_noise_calibration_window_ages_out_outliers():
    """r12 ADVICE item 2: one anomalous same-tree run must not weaken
    the gate forever — rows older than CALIBRATION_WINDOW stop feeding
    the band."""
    from check_bench_regression import CALIBRATION_WINDOW

    outlier = [{"git_sha": "old", "sf": 0.1, "queries": {"q1": 1.0}},
               {"git_sha": "old", "sf": 0.1, "queries": {"q1": 3.0}}]
    fresh = [{"git_sha": f"s{i}", "sf": 0.1, "queries": {"q1": 1.0}}
             for i in range(CALIBRATION_WINDOW)]
    hist = outlier + fresh
    band = noise_band(hist)
    assert band["per_query"] == {}      # the 3.0x pair aged out
    assert effective_thresholds(hist)[0] == 1.5
    # still inside the window -> it counts
    band2 = noise_band(outlier + fresh[:CALIBRATION_WINDOW - 2])
    assert band2["per_query"] == {"q1": 3.0}


def test_gate_fires_on_cross_sha_regression():
    """r12 verdict item 3: prove the assert can still fail — a
    synthetic cross-SHA history where one query regresses 3x (far
    beyond its own measured noise) must come back as a regression,
    while a query inside its own noise band must not."""
    hist = [
        # two same-tree runs at SHA A calibrate noise: q1 1.2x, q2 1.05x
        {"git_sha": "A", "sf": 0.1,
         "queries": {"q1": 1.0, "q2": 2.0}, "value": 3.0},
        {"git_sha": "A", "sf": 0.1,
         "queries": {"q1": 1.2, "q2": 2.1}, "value": 3.3},
        {"git_sha": "A", "sf": 0.1,
         "queries": {"q1": 1.1, "q2": 2.0}, "value": 3.1},
        # new source tree: q1 regresses 3x, q2 wobbles 1.1x (noise)
        {"git_sha": "B", "sf": 0.1,
         "queries": {"q1": 3.3, "q2": 2.2}, "value": 5.5},
    ]
    cur = hist[-1]
    window = hist[-4:-1]
    # the same-SHA exemption must NOT trigger across A -> B
    assert not all(same_tree(e, cur) for e in window)
    thr, per_q = effective_thresholds(hist)
    regressions, _ = compare(median_baseline(hist), cur,
                             threshold=thr, per_query=per_q)
    assert [r["query"] for r in regressions] == ["q1"]
    assert regressions[0]["ratio"] == 3.0


def test_box_speed_scaling():
    """r13: a measured HOST slowdown (identical pure-CPU yardstick
    running slower) scales the gate so uniform box drag is not read
    as a source regression — while a query regressing far beyond the
    box factor still fires, and a FASTER box never loosens or
    tightens anything."""
    base = [
        {"git_sha": "A", "sf": 0.1, "cpu_yardstick_sec": 0.50,
         "queries": {"q1": 1.0, "q2": 2.0}, "value": 3.0},
        {"git_sha": "A", "sf": 0.1, "cpu_yardstick_sec": 0.51,
         "queries": {"q1": 1.1, "q2": 2.1}, "value": 3.2},
        {"git_sha": "A", "sf": 0.1, "cpu_yardstick_sec": 0.50,
         "queries": {"q1": 1.0, "q2": 2.0}, "value": 3.0},
    ]
    # box now 1.4x slower: q1 drags uniformly (1.45x — above the
    # static 1.5? no: 1.45 < 1.5 anyway; make it 1.6x to exceed the
    # unscaled gate), q2 genuinely regresses 3x
    cur = {"git_sha": "B", "sf": 0.1, "cpu_yardstick_sec": 0.70,
           "queries": {"q1": 1.6, "q2": 6.0}, "value": 7.6}
    hist = base + [cur]
    assert box_speed_ratio(hist) == 1.4
    thr, per_q, box = scaled_thresholds(hist)
    assert box == 1.4
    regressions, _ = compare(median_baseline(hist), cur,
                             threshold=thr, per_query=per_q)
    # q1's 1.6x is inside 1.5 * 1.4 = 2.1; q2's 3x is far beyond it
    assert [r["query"] for r in regressions] == ["q2"]
    # rows without a yardstick (pre-r13) -> no ratio, no scaling
    legacy = [{k: v for k, v in e.items() if k != "cpu_yardstick_sec"}
              for e in hist]
    assert box_speed_ratio(legacy) is None
    assert scaled_thresholds(legacy)[2] == 1.0
    # a FASTER box (ratio < 1) must not scale in either direction
    fast = base + [dict(cur, cpu_yardstick_sec=0.40)]
    assert scaled_thresholds(fast)[2] == 1.0
    # the MULTI-CORE probe alone can drive the factor: single-core
    # healthy but shared-hardware (SMT/LLC/bandwidth) contended is
    # exactly the r13 failure mode
    mt_base = [dict(e, cpu_yardstick_mt_sec=2.0) for e in base]
    mt_cur = dict(cur, cpu_yardstick_sec=0.50, cpu_yardstick_mt_sec=3.0)
    assert box_speed_ratio(mt_base + [mt_cur]) == 1.5
    assert scaled_thresholds(mt_base + [mt_cur])[2] == 1.5
    # an anomalous probe is clamped at the cap, not trusted verbatim
    from check_bench_regression import BOX_RATIO_CAP
    wild = base + [dict(cur, cpu_yardstick_sec=5.0)]
    assert scaled_thresholds(wild)[2] == BOX_RATIO_CAP


def test_explicit_threshold_sentinel():
    """r12 ADVICE item 3: an explicit --threshold equal to the static
    default must force the strict gate, not be silently replaced by
    the noise-derived one — pinned at the CLI layer by running main()
    against a fixture history."""
    import json as _json
    import subprocess
    import tempfile

    import check_bench_regression as cbr

    hist = [
        {"git_sha": "A", "sf": 0.1, "queries": {"q1": 1.0}, "value": 1.0},
        {"git_sha": "A", "sf": 0.1, "queries": {"q1": 2.2}, "value": 2.2},
        {"git_sha": "A", "sf": 0.1, "queries": {"q1": 1.0}, "value": 1.0},
        # cross-SHA run: 1.6x — above static 1.5, inside noisy 2.2x band
        {"git_sha": "B", "sf": 0.1, "queries": {"q1": 1.6}, "value": 1.6},
    ]
    with tempfile.NamedTemporaryFile("w", suffix=".jsonl",
                                     delete=False) as f:
        for e in hist:
            f.write(_json.dumps(e) + "\n")
        tmp = f.name
    env = dict(os.environ)
    script = (
        "import sys; sys.argv = ['x'] + sys.argv[1:]; "
        "import check_bench_regression as cbr; "
        f"cbr.HISTORY = {tmp!r}; "
        "import functools; "
        "cbr.load_history = functools.partial(cbr.load_history, "
        f"{tmp!r}); "
        "sys.exit(cbr.main())")
    tools = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "tools")
    # noise-derived gate (2.2 * 1.05 = 2.31x): 1.6x passes
    r0 = subprocess.run([sys.executable, "-c", script],
                        cwd=tools, env=env, capture_output=True, text=True)
    assert r0.returncode == 0, r0.stdout + r0.stderr
    # explicit --threshold 1.5 (== static default) must fail it
    r1 = subprocess.run([sys.executable, "-c", script,
                         "--threshold", "1.5"],
                        cwd=tools, env=env, capture_output=True, text=True)
    assert r1.returncode == 1, r1.stdout + r1.stderr
    assert "noise derivation off" in r1.stdout
    os.unlink(tmp)


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


def test_bench_line_sticky_hysteresis():
    """r14 (r13 verdict item 5/8): the driver-visible line's elision
    cutoff must not flicker with run-to-run noise — every name emitted
    on the previous run stays emitted under ±10% jitter (no phantom
    "dropped_from_bench") — while a genuinely regressed non-sticky
    query still displaces sticky faster ones."""
    import json
    import random

    from bench import format_bench_line

    t = {f"dedup_query_family_{i:03d}": 0.5 + (i % 90) * 0.02
         for i in range(170)}
    line1 = format_bench_line(t, 123.4, 0.1)
    assert len(line1) <= 1900
    kept1 = set(json.loads(line1)["queries"])
    assert json.loads(line1).get("queries_omitted") == 170 - len(kept1)

    random.seed(7)
    jittered = {k: v * random.uniform(0.9, 1.1) for k, v in t.items()}
    line2 = format_bench_line(jittered, 123.4, 0.1, tuple(kept1))
    kept2 = set(json.loads(line2)["queries"])
    assert kept1 - kept2 == set(), "sticky names flickered out"

    regressed = dict(jittered)
    regressed["dedup_query_family_000"] = 3.0  # was among the fastest
    line3 = format_bench_line(regressed, 123.4, 0.1, tuple(kept1))
    assert "dedup_query_family_000" in json.loads(line3)["queries"], \
        "regressed query hidden by the sticky set"
