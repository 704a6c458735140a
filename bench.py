"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric","value","unit","queries","sf"}.

Each query is forced end-to-end with a noop write (full computation, no
driver collect). Timings include plan + execution, not session startup.

PROCEDURE (r9 verdict item 8): run this TWICE per round, at the start
and end of the round's work. Same-tree runs on this box differ by a
~1.09-1.16x per-query MEDIAN and up to ~2.2x per-query WORST (r12's
four same-source pairs; r9's interleaved A/B first measured it); a
single run therefore can neither prove nor clear a drift claim. Both
runs append to artifacts/BENCH_HISTORY.jsonl stamped with a SOURCE-
TREE hash (git_sha below), and tests/test_bench_gate.py compares the
NEWEST run against the per-query median of the last 3 history rows —
skipping entirely when the whole window shares the current source
hash (identical source cannot regress), and otherwise gating at a
threshold derived from the measured same-tree spread.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


#: the paths that define bench BEHAVIOR — the same set the r11
#: verdict's same-source audit diffed. Artifact/docs/tools commits
#: leave these git objects untouched, so runs across such commits
#: still compare as the SAME tree.
_SRC_PATHS = ["csvplus_spark", "__spark_entry__.py", "bench.py"]


def git_sha() -> str:
    """SOURCE-TREE hash at run time ('src-' + sha256 of the three
    behavior-defining paths' git object ids), '-dirty'-suffixed when
    those paths have uncommitted edits. The regression gate treats two
    runs at the same clean hash as the SAME source tree — an identical
    tree cannot regress (r11: the driver's 200.7s row vs the builder's
    163.4s rows of byte-identical source failed the gate on box noise
    alone). Keyed on the source OBJECTS, not the commit sha, so an
    artifact-only commit between a builder run and the driver's run
    does not break the pairing."""
    import hashlib
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        ids = subprocess.run(
            ["git", "rev-parse"] + [f"HEAD:{p}" for p in _SRC_PATHS],
            cwd=here, capture_output=True, text=True,
            timeout=10).stdout.strip()
        if not ids or len(ids.splitlines()) != len(_SRC_PATHS):
            return ""
        src = "src-" + hashlib.sha256(ids.encode()).hexdigest()[:20]
        # a prior bench run's own artifact writes, or edits to
        # tools/tests/docs, must not mark the next same-tree run dirty
        # — but an UNTRACKED file under the source paths must (r12
        # ADVICE item 5: a new module picked up via package import
        # changes behavior without touching any tracked object);
        # __pycache__/*.pyc are gitignored, so they don't trip this
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=all",
             "--"] + _SRC_PATHS,
            cwd=here, capture_output=True, text=True,
            timeout=10).stdout.strip()
        return src + ("-dirty" if dirty else "")
    except Exception:
        return ""


def cpu_yardstick(reps: int = 3) -> float:
    """Single-core box-speed probe: seconds for a FIXED md5 chain
    (min of ``reps``). The work is identical every run and pure CPU —
    no I/O, no JVM, no allocation growth — so the ratio between two
    runs' yardsticks measures the BOX, not the source tree. Stamped
    into every history row (r13): the round-13 trio ran 1.4x slower
    than round-12's on BYTE-IDENTICAL behavior (proven by an
    interleaved A/B against the checked-out r12 tree) with <2% steal
    — host-level slowdown the regression gate would otherwise read as
    a uniform source regression. tools/check_bench_regression.py
    scales its cross-SHA thresholds by this ratio when the box is
    measurably slower. ~0.55s nominal on this box at full speed."""
    import hashlib

    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        b = b"x" * 4096
        for _ in range(60000):
            b = hashlib.md5(b).digest() + b[:4080]
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def cpu_yardstick_mt(threads: int = 32, reps: int = 2) -> float:
    """Multi-core box-speed probe: seconds for a fixed md5 sweep over
    an 8 MB buffer on ``threads`` concurrent Python threads (hashlib
    releases the GIL on large buffers, so this runs genuinely parallel
    at the bench's own local[32] width). It exercises the SHARED
    hardware the single-core probe can't see — SMT siblings, last-level
    cache, memory bandwidth — which is where hypervisor noisy-neighbor
    contention lands first: the r13 1.4x bench slowdown happened with
    the single-core yardstick HEALTHY (0.47s vs 0.55s under light
    load), so only a full-width probe can attribute it. ~2.7s nominal
    (32 threads x 40 x 8 MB at ~7.7 GB/s aggregate)."""
    import hashlib
    import threading

    buf = b"x" * (8 << 20)

    def work() -> None:
        for _ in range(40):
            hashlib.md5(buf).digest()

    best = None
    for _ in range(reps):
        ths = [threading.Thread(target=work) for _ in range(threads)]
        t0 = time.perf_counter()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


#: headline set — one per operator family (join, anti, order, dedup,
#: agg, window, scalar, extensions get added as they land)
HEADLINE = [
    "flagship",
    "join_unique",
    "join_prefix",
    "except_anti",
    "top_k",
    "resolve_dups_first",
    "agg_pricing_summary",
    "window_rank",
    "scalar_date",
    "json_props",
    "text_stats",
    "dedup_exact",
    "dedup_ngram",
    "dedup_minhash",
    "simhash",
    "sim_topk",
    "events_tumbling",
    "events_session",
    "funnel",
    "retention",
    "tpch_q3_shipping",
    "tpch_q5_volume",
    "tpch_q10_returns",
    "dedup_clusters",
    "dedup_clusters_fast",
    "pagerank",
    "pagerank_reps",
    "kcore_reps",
    "triangles_reps",
    "triangles",
    "tpch_q9_profit",
    "window_lead_ntile",
    "tfidf",
    # simhash_pairs (32-bit legacy) is EXCLUDED from the timed set: its
    # answer is ~n²/6 rows on template corpora (1.9G rows at sf3,
    # SCALE.md), so its timing measures output materialization, not
    # plan quality — the linear simhash_pairs60/simhash_reps60 shapes
    # below are the recommended entry points and stay timed. The
    # oracle entry remains in queries() for continuity. (r7 verdict 4)
    "simhash_pairs60",
    "simhash_reps60",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "hash_sample",
    "range_join",
    "winnow",
    "token_counts",
    "bpe_counts",
    "repetition_stats",
    "content_flags",
    "pii_scrub",
    "boilerplate",
    "token_budget_mix",
    "rarity",
    "profile",
    "top_ties",
    "skew_salted_join",
    "quantize_embeddings",
    "rand_proj",
    "normalize_embeddings",
    "mean_pool",
    "chunk_docs",
    "pack_sequences",
    "contamination",
    "canonicalize",
    "training_set",
    "snapshot_diff",
    "expectations",
    "gopher_quality",
    "novel_bigrams",
    "source_mix",
    "knn_label",
    "tpch_q18_bigorders",
    "global_shuffle",
    "quality_topfrac",
    "repeated_spans",
    "remove_spans",
    "dedup_minhash_fast",
    "dedup_ngram_fast",
    "semantic_dedup",
    "skew_report",
    "ann_recall",
    "tpch_q6_forecast",
    "tpch_q14_promo",
    "unigram_lm",
    "bm25",
    "semantic_contam",
    "temperature_mix",
    "multimodal_png",
    "multimodal_jpeg",
    "avro_ingest",
    "dup_factor",
    "multimodal_jpeg_px",
    "avro_snappy_ingest",
    "multimodal_resize_px",
    "multimodal_png_px",
    "multimodal_gif",
    "multimodal_flac",
    "multimodal_tiff",
    "multimodal_grid",
    "approx_quantiles",
    "bigram_lm",
    "dsir",
    "linear_scorer",
    "weighted_sample",
    "kmeans",
    "cluster_balance",
    "tpch_q4_priority",
    "tpch_q12_priority",
    "tpch_q19_disjuncts",
    "tpch_q22_idle",
    "pq_topk",
    "ivf2_seeded",
    "fuzzy_join",
    "fuzzy_join_fast",
    "bm25_search",
    "embedding_drift",
    "tpch_q21_waiting",
    "tpch_q16_suppcnt",
    "multimodal_wav",
    "multimodal_mp4",
    "tpch_q7_volume",
    "tpch_q8_share",
    "tpch_q13_custdist",
    "tpch_q15_topsupp",
    "tpch_q17_smallqty",
    "tpch_q20_promosupp",
    "ccnet_buckets",
    "dedup_keep_best",
    "kcenter",
    "cms_topk",
    "events_outliers",
    "tpch_q2_mincost",
    "dedup_keep_best_fast",
    "leakage_split",
    "events_rolling",
    "dedup_containment",
    "dedup_containment_fast",
    "winsorize",
    "tpch_q11_share",
    "minhash_calibration",
    "kcore",
    "edit1_names",
    "attribution",
    "scd2",
    "events_ema",
    "bloom_contam",
    "copurchase",
    "rfm",
    # r8: every remaining queries() entry gets a timing row (r7
    # verdict 6 — no silent caps); the ONLY timed-set exclusion is
    # simhash_pairs, documented above
    "select_project",
    "drop_columns",
    "filter_any",
    "map_derive",
    "index_find",
    "sub_index",
    "drop_offset",
    "take_while",
    "drop_while",
    "union_distinct",
    "stream_tumbling",
    "stream_interval",
    "events_sliding",
    "asof_join",
    "join_outer",
    "rollup_agg",
    "window_running",
    "intersect",
    "except_all",
    "intersect_all",
    "incremental_dedup",
    "agg_distinct",
    "multimodal_meta",
    "explode_tokens",
    "cube_agg",
    "scalar_string_math",
    "quantiles",
    "pivot",
    "approx_distinct",
    "date_arith",
    "null_funcs",
    "ivf_seeded",
    "multimodal_features",
    "lang_cap",
]


def format_bench_line(timings: dict[str, float], total: float,
                      sf: float, sticky: tuple[str, ...] = ()) -> str:
    """The driver-facing stdout line: warm-only, compact, and HARD
    capped under ~1.9 KB — the driver keeps only the last 2000 chars
    of stdout, and r6's oversized line parsed as null. If the query
    set outgrows the budget, the FASTEST entries are elided (the slow
    tail is where regressions live) with an explicit omitted count.

    ``sticky`` (r14, r13 verdict item 5/8): names to PREFER KEEPING —
    main() passes the PREVIOUS run's emitted set (recorded per history
    row as ``stdout_queries``), so a query that straddles the elision
    cutoff stays in the line across consecutive runs instead of
    flickering in and out (the driver read 7 such flickers as phantom
    "dropped_from_bench" in r13; all 7 had run and passed). Sticky
    names get a bounded 1.5x retention boost in the elision order —
    HYSTERESIS, not a hard keep: run-to-run noise (~1.1-1.3x on this
    box) can no longer flip a borderline query out of the line, while
    a genuinely regressed non-sticky query (≥1.5x into the slow tail)
    still displaces sticky faster ones, so regressions stay visible.
    Every elided query still ran, is counted in ``value``, and is
    recorded with full precision in artifacts/BENCH_full.json and
    BENCH_HISTORY.jsonl."""
    warm2 = {k: round(v, 2) for k, v in timings.items()}
    stick = set(sticky) & set(warm2)

    def emit(names) -> str:
        keep = {k: warm2[k]
                for k in sorted(names, key=lambda k: (-warm2[k], k))}
        payload: dict = {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": keep,
        }
        if len(keep) < len(warm2):
            payload["queries_omitted"] = len(warm2) - len(keep)
        payload["sf"] = sf
        return json.dumps(payload, separators=(",", ":"))

    names = list(warm2)
    line = emit(names)
    if len(line) <= 1900:
        return line
    # drop order: fastest first, with a 1.5x retention boost for
    # sticky names (hysteresis — see docstring)
    order = sorted(names, key=lambda k: (
        warm2[k] * (1.5 if k in stick else 1.0), k))
    while len(line) > 1820 and order:
        order.pop(0)
        line = emit(order)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # box-speed probes BEFORE the session exists: no JVM threads to
    # perturb the measurements
    yardstick = cpu_yardstick()
    yardstick_mt = cpu_yardstick_mt()

    import __spark_entry__ as entry_mod
    from csvplus_spark import get_spark

    spark = get_spark("csvplus-bench")
    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm the JVM + parquet footers with the cheapest query once
    qs[names[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # two full passes, per-query MIN: single-pass timings swing +-30%
    # on heavy queries (GC debt from whichever Python-UDF query ran
    # before, OS cache state); the min of two runs measures the plan,
    # not the neighborhood
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            # untimed GC between queries: heavy Python-UDF neighbors
            # leave JVM GC debt that distorts the NEXT query's timing
            # by ±30% (NOTES round-6 variance caveat); collecting it
            # outside the timed section measures the plan, not the
            # neighborhood
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            t0 = time.time()
            try:
                qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
                t = round(time.time() - t0, 3)
                timings[name] = min(timings.get(name, t), t)
                if _pass == 0:
                    cold[name] = t
            except Exception as exc:  # one broken query must not kill the bench
                print(f"bench: {name} failed: {exc}", file=sys.stderr)
                timings[name] = -1.0
                if _pass == 0:
                    cold[name] = -1.0  # a pass-2 success is WARM, not cold

    total = round(sum(t for t in timings.values() if t > 0), 3)

    # Full payload (warm + cold, 3 decimals) goes to artifacts/ — the
    # driver only sees the last ~2000 chars of stdout, and round 6's
    # line with queries_cold inline overflowed that tail and parsed as
    # null. Keep stdout minimal; everything else lives in files.
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "sf": sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        # same-SHA history rows are noise calibration for the
        # regression gate, never regressions (r11 verdict item 1)
        "git_sha": git_sha(),
        # box-speed probes: cross-run timing ratios are only
        # interpretable against these (see cpu_yardstick /
        # cpu_yardstick_mt — single-core speed and full-width
        # shared-hardware throughput degrade independently)
        "cpu_yardstick_sec": yardstick,
        "cpu_yardstick_mt_sec": yardstick_mt,
    }
    # sticky set: the PREVIOUS run's emitted names, so the driver-
    # visible line keeps a stable slow-tail across consecutive runs
    # (see format_bench_line; r13 verdict item 5/8 — phantom drops)
    prev_emitted: list[str] = []
    hist_path = os.path.join(art_dir, "BENCH_HISTORY.jsonl")
    try:
        with open(hist_path) as f:
            for raw in f:
                raw = raw.strip()
                if raw:
                    prev_emitted = json.loads(raw).get(
                        "stdout_queries") or prev_emitted
    except Exception:
        prev_emitted = []
    line = format_bench_line(timings, total, sf, tuple(prev_emitted))
    full["stdout_queries"] = sorted(json.loads(line)["queries"])

    with open(os.path.join(art_dir, "BENCH_full.json"), "w") as f:
        json.dump(full, f, indent=1)
    # round-over-round history: one row per bench run, append-only
    with open(hist_path, "a") as f:
        f.write(json.dumps(full, separators=(",", ":")) + "\n")

    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
