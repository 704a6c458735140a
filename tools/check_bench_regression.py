"""Per-query bench regression gate over artifacts/BENCH_HISTORY.jsonl.

BENCH_HISTORY.jsonl gets one row per bench run (bench.py appends the
full warm+cold payload, stamped with the git SHA since r12). This gate
compares the LATEST run's warm timings to the per-query median of the
three runs before it (or an explicit --baseline index) and fails on
any shared query that slowed by more than the threshold while taking
at least FLOOR seconds in the baseline — the r2 agg_pricing_summary
2.17× and r6 collapse-by-default 5.9→9.4s regressions were both
caught only by manual A/B; this automates that check (r7 verdict
item 3).

SHA awareness (r11 verdict item 1): runs at the same clean git SHA are
the SAME source tree, and an identical tree cannot regress — their
spread is the box's measured noise (r11: winnow 1.76× per-query, 1.23×
total on byte-identical source). The gate (a) skips entirely when the
whole baseline window shares the current run's SHA, and (b) otherwise
derives its thresholds from the measured same-tree spread. Only
like-for-like rows are compared (same sf as the current run).

Calibration is PER QUERY and WINDOWED (r12 ADVICE item 2): a query is
gated at NOISE_MARGIN × its OWN worst same-tree spread (a genuinely
noisy query like winnow earns its own slack without weakening the
gate for the other 80), queries with no same-tree sample fall back to
a high quantile (p90) of the per-query spread distribution — not the
global sample maximum, which one anomalous run would otherwise pin
forever — and only the newest CALIBRATION_WINDOW history rows feed
the calibration, so an old outlier run ages out. Nothing ever gates
below the static THRESHOLD.

Usage:
    python tools/check_bench_regression.py [--baseline N] [--threshold X]

Also importable: ``compare(base, cur)`` returns (regressions, table)
so the pytest wrapper (tests/test_bench_gate.py) runs the same logic.
"""

from __future__ import annotations

import json
import os
import sys

THRESHOLD = 1.5   # fail when cur/base exceeds this ...
FLOOR = 0.5       # ... and base took at least this many seconds
#: safety margin over the measured same-tree spread when deriving the
#: effective threshold — the worst observed noise ratio is a sample
#: maximum, not a bound
NOISE_MARGIN = 1.05
#: newest history rows feeding the noise calibration — an anomalous
#: run must age out of the band, not weaken the gate forever
#: (r12 ADVICE item 2); 12 rows ≈ the last 4 rounds' bench trios
CALIBRATION_WINDOW = 12

HISTORY = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "BENCH_HISTORY.jsonl")


def load_history(path: str = HISTORY, sf_filter: bool = True) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        hist = [json.loads(line) for line in f if line.strip()]
    # compare like-for-like only: a stray run at a different scale
    # factor must not enter the baseline window of an sf0.1 run.
    # main() prints the filter and the surviving count before any
    # --baseline index resolves against the filtered list (r12 ADVICE
    # item 4); sf_filter=False returns the raw rows for that report.
    if hist and sf_filter:
        sf = hist[-1].get("sf")
        hist = [e for e in hist if e.get("sf") == sf]
    return hist


def run_sha(entry: dict) -> str | None:
    """Clean git SHA of a history row, or None when unknown/dirty —
    only two runs at the same CLEAN sha are provably the same tree."""
    sha = entry.get("git_sha") or ""
    if not sha or sha.endswith("-dirty"):
        return None
    return sha


def same_tree(a: dict, b: dict) -> bool:
    sa, sb = run_sha(a), run_sha(b)
    return sa is not None and sa == sb


def noise_band(history: list[dict], floor: float = FLOOR,
               window: int = CALIBRATION_WINDOW) -> dict:
    """Measured same-tree spread over the newest ``window`` history
    rows: for every group of runs sharing a clean git SHA, the
    per-query max/min timing ratio (queries with min >= floor only,
    mirroring the gate's floor). An identical tree cannot regress, so
    this spread IS the box noise the gate must tolerate (r11: winnow
    1.76x, total 1.23x on byte-identical source). Returns
    {"worst": r, "query": name, "pairs": n_same_sha_runs_compared,
    "per_query": {q: worst_same_tree_ratio}, "p90": quantile}."""
    recent = history[-window:] if window else history
    by_sha: dict[str, list[dict]] = {}
    for e in recent:
        s = run_sha(e)
        if s:
            by_sha.setdefault(s, []).append(e)
    per_query: dict[str, float] = {}
    pairs = 0
    for runs in by_sha.values():
        if len(runs) < 2:
            continue
        pairs += len(runs)
        vals: dict[str, list[float]] = {}
        for e in runs:
            for k, v in (e.get("queries") or {}).items():
                if v is not None and v > 0:
                    vals.setdefault(k, []).append(v)
        for k, vs in vals.items():
            if len(vs) >= 2 and min(vs) >= floor:
                r = max(vs) / min(vs)
                if r > per_query.get(k, 1.0):
                    per_query[k] = r
    worst_q = max(per_query, key=per_query.get) if per_query else None
    spreads = sorted(per_query.values())
    # p90 of the per-query spread distribution: the default for
    # queries with no same-tree sample of their own — deliberately
    # NOT the sample max, which one anomalous query would pin
    import math

    p90 = (spreads[min(len(spreads) - 1,
                       max(0, math.ceil(0.9 * len(spreads)) - 1))]
           if spreads else 1.0)
    return {"worst": round(per_query.get(worst_q, 1.0), 3),
            "query": worst_q, "pairs": pairs,
            "per_query": {k: round(v, 3) for k, v in per_query.items()},
            "p90": round(p90, 3)}


def effective_thresholds(history: list[dict],
                         band: dict | None = None) -> tuple[float, dict]:
    """(default_threshold, per_query_thresholds): each query gates at
    NOISE_MARGIN x its OWN worst same-tree spread within the
    calibration window; queries without a same-tree sample use
    NOISE_MARGIN x the p90 of the spread distribution. Nothing gates
    below the static THRESHOLD — a gate tighter than the box's own
    noise on identical source can only produce false reds.
    ``band`` reuses a precomputed noise_band so callers that also
    print it derive thresholds from the SAME numbers (r13 review)."""
    band = band if band is not None else noise_band(history)
    default = max(THRESHOLD, round(band["p90"] * NOISE_MARGIN, 3))
    per_q = {q: max(THRESHOLD, round(r * NOISE_MARGIN, 3))
             for q, r in band["per_query"].items()}
    return default, per_q


def effective_threshold(history: list[dict]) -> float:
    """Back-compat single-number view: the DEFAULT (p90-derived)
    threshold — per-query gating happens via effective_thresholds."""
    return effective_thresholds(history)[0]


#: below this measured box slowdown the per-query noise band already
#: covers it; above BOX_RATIO_CAP the yardstick itself is suspect
#: (a probe blip must not make the gate vacuous — the cap bounds the
#: worst false-negative weakening at CAP x threshold, and the largest
#: REAL host drag ever measured here is 1.4x, r13)
BOX_RATIO_MIN = 1.10
BOX_RATIO_CAP = 2.0


def box_speed_ratio(history: list[dict], n: int = 3,
                    baseline: dict | None = None) -> float | None:
    """How much slower the box is NOW than during the baseline:
    newest run's yardstick / median of the last ``n`` prior runs'
    (or ``baseline``'s own yardsticks when an explicit baseline row is
    being compared against — host drift must be measured against the
    SAME run the timings are compared against), for each stamped
    probe, taking the WORSE (slower) of the two. Each yardstick is
    identical pure-CPU work every run — single-core
    (cpu_yardstick_sec) and full-width shared-hardware throughput
    (cpu_yardstick_mt_sec: SMT siblings, LLC, memory bandwidth) — so
    these ratios isolate HOST speed from source behavior. The r13 trio
    ran 1.4x slower than r12's on byte-identical source (interleaved
    r12-tree A/B, <2% steal) with the single-core probe HEALTHY, which
    is why the full-width probe exists: hypervisor noisy-neighbor
    contention lands on shared hardware first. None when no probe is
    present on both sides (pre-r13 rows)."""
    import statistics

    if len(history) < 2:
        return None
    base_rows = [baseline] if baseline is not None else history[-(n + 1):-1]
    ratios = []
    for key in ("cpu_yardstick_sec", "cpu_yardstick_mt_sec"):
        cur = history[-1].get(key)
        prev = [y for y in (e.get(key) for e in base_rows) if y]
        if cur and prev:
            ratios.append(cur / statistics.median(prev))
    return round(max(ratios), 3) if ratios else None


def scaled_thresholds(history: list[dict],
                      baseline: dict | None = None,
                      band: dict | None = None
                      ) -> tuple[float, dict, float]:
    """(default_threshold, per_query_thresholds, box_factor): the
    effective_thresholds, multiplied by the measured box slowdown when
    the yardstick shows the box running >BOX_RATIO_MIN slower than the
    baseline — identical work takes box_ratio longer on a slower
    host, so a query must exceed threshold x box_ratio to be a SOURCE
    regression. ``baseline`` pins the ratio to an explicit baseline
    row (--baseline mode). A faster box (ratio < 1) never tightens the
    gate (yardstick noise would manufacture false reds); a ratio over
    BOX_RATIO_CAP is clamped (a probe that anomalous must not make
    the gate vacuous). Residual risk, accepted: a contention blip that
    spans every probe repetition of the CURRENT run inflates the
    factor and loosens the gate for that one comparison — bounded by
    the cap, and the per-run min-of-reps probes already bias toward
    the least-contended moment."""
    default, per_q = effective_thresholds(history, band=band)
    ratio = box_speed_ratio(history, baseline=baseline)
    factor = 1.0
    if ratio is not None and ratio > BOX_RATIO_MIN:
        factor = min(ratio, BOX_RATIO_CAP)
    if factor > 1.0:
        default = round(default * factor, 3)
        per_q = {q: round(t * factor, 3) for q, t in per_q.items()}
    return default, per_q, factor


def median_baseline(history: list[dict], n: int = 3) -> dict:
    """Per-query MEDIAN over the last ``n`` runs before the current
    one — a single anomalously fast run must not turn the next normal
    run into a false regression (winnow r8: 1.75, 1.83, 0.93, 1.72 —
    the 0.93 was the outlier). A real regression persists against the
    median; a lucky baseline doesn't."""
    import statistics

    prev = history[-(n + 1):-1] if len(history) > 1 else []
    vals: dict[str, list[float]] = {}
    for e in prev:
        for k, v in (e.get("queries") or {}).items():
            if v is not None and v > 0:
                vals.setdefault(k, []).append(v)
    return {"queries": {k: statistics.median(v) for k, v in vals.items()},
            "value": prev[-1].get("value") if prev else None}


def compare(base: dict, cur: dict, threshold: float = THRESHOLD,
            floor: float = FLOOR,
            per_query: dict | None = None) -> tuple[list[dict], list[dict]]:
    """(regressions, full trend table) between two history entries.

    Only queries present in BOTH runs with positive timings are
    compared (a -1 marks a failed query — correctness gates catch
    those; new/removed queries have no baseline to regress from).
    ``per_query`` overrides the threshold for individual queries
    (their own measured same-tree noise, effective_thresholds)."""
    b, c = base.get("queries") or {}, cur.get("queries") or {}
    per_query = per_query or {}
    table = []
    for name in sorted(set(b) & set(c)):
        tb, tc = b[name], c[name]
        if tb is None or tc is None or tb <= 0 or tc <= 0:
            continue
        table.append({"query": name, "base": tb, "cur": tc,
                      "ratio": round(tc / tb, 3),
                      "threshold": per_query.get(name, threshold)})
    table.sort(key=lambda r: -r["ratio"])
    regressions = [r for r in table
                   if r["base"] >= floor and r["ratio"] > r["threshold"]]
    return regressions, table


def trend_table(table: list[dict], top: int = 15) -> str:
    lines = [f"{'query':<28} {'base':>7} {'cur':>7} {'ratio':>6} {'gate':>6}"]
    for r in table[:top]:
        lines.append(f"{r['query']:<28} {r['base']:>7.2f} "
                     f"{r['cur']:>7.2f} {r['ratio']:>6.2f} "
                     f"{r.get('threshold', THRESHOLD):>6.2f}")
    return "\n".join(lines)


def main() -> int:
    args = sys.argv[1:]
    baseline_ix = None  # None = median mode; an explicit index wins
    threshold = None    # None sentinel (r12 ADVICE item 3): an EXPLICIT
    #                     --threshold — even one equal to the static
    #                     default — always wins over noise derivation
    while args:
        if args[0] == "--baseline":
            baseline_ix = int(args[1]); args = args[2:]
        elif args[0] == "--threshold":
            threshold = float(args[1]); args = args[2:]
        else:
            print(f"unknown arg: {args[0]}"); return 2
    raw = load_history(sf_filter=False)
    hist = load_history()
    if len(hist) < 2:
        print("bench history has <2 runs — nothing to compare")
        return 0
    cur = hist[-1]
    # r12 ADVICE item 4: --baseline indexes the sf-FILTERED list; say
    # so (and how much the filter dropped) before resolving the index
    print(f"sf filter: {cur.get('sf')} — {len(hist)} of {len(raw)} "
          f"history rows survive (indices refer to the filtered list)")
    band = noise_band(hist)
    print(f"same-tree noise band (last {CALIBRATION_WINDOW} rows): "
          f"worst {band['worst']}x ({band['query']}), p90 {band['p90']}x, "
          f"{len(band['per_query'])} queries calibrated over "
          f"{band['pairs']} same-SHA runs")
    # resolve the baseline FIRST: in --baseline mode the box-speed
    # ratio must be measured against the CHOSEN row's own yardsticks,
    # not the recent window's — comparing old timings with a
    # recent-window ratio would mis-compensate exactly the host drift
    # the yardstick exists for (r13 review)
    base_row = None
    if baseline_ix is not None:
        run_no = baseline_ix if baseline_ix >= 0 else len(hist) + baseline_ix
        if run_no == len(hist) - 1:
            print("--baseline points at the CURRENT run — comparing a "
                  "run to itself proves nothing")
            return 2
        base_row = hist[baseline_ix]
    if threshold is not None:
        default_thr, per_q = threshold, {}
        print(f"explicit --threshold {threshold}x (noise derivation off)")
    else:
        default_thr, per_q, box = scaled_thresholds(hist, baseline=base_row,
                                                    band=band)
        ratio = box_speed_ratio(hist, baseline=base_row)
        if ratio is not None:
            print(f"box-speed yardstick: current run {ratio}x the "
                  + ("chosen baseline's" if base_row is not None
                     else "baseline window's")
                  + (f" -> thresholds scaled by {box}x (host slowdown "
                     f"is not a source regression)" if box > 1.0
                     else " (within yardstick noise, no scaling)"))
    if baseline_ix is not None:
        base, label = base_row, f"run {run_no}"
        if same_tree(base, cur):
            print(f"run {run_no} and the current run are the SAME clean "
                  f"SHA — identical source cannot regress (spread is "
                  f"noise calibration)")
            _, table = compare(base, cur, threshold=default_thr,
                               per_query=per_q)
            print(trend_table(table))
            return 0
    else:
        base, label = median_baseline(hist), "median of last 3 runs"
        window = hist[-4:-1]
        if window and all(same_tree(e, cur) for e in window):
            print("entire baseline window shares the current run's clean "
                  "SHA — identical source cannot regress (spread is "
                  "noise calibration)")
            _, table = compare(base, cur, threshold=default_thr,
                               per_query=per_q)
            print(trend_table(table))
            return 0
    regressions, table = compare(base, cur, threshold=default_thr,
                                 per_query=per_q)
    print(f"comparing {label} "
          f"({len(base.get('queries') or {})} queries)"
          f" -> run {len(hist) - 1} (total {cur.get('value')}s, "
          f"{len(cur.get('queries') or {})} queries)")
    print(trend_table(table))
    if regressions:
        print(f"\nREGRESSIONS (over the per-query gate on a >= {FLOOR}s "
              f"query; default {default_thr}x):")
        for r in regressions:
            print(f"  {r['query']}: {r['base']}s -> {r['cur']}s "
                  f"({r['ratio']}x > {r['threshold']}x)")
        return 1
    print("\nno per-query regression")
    return 0


if __name__ == "__main__":
    sys.exit(main())
