"""Scale-critical timing sweep at a scaled sf dir (default
.localdata/sf10, the tools/make_scaled_sf.py output at duplication
factor 100 — 60M-row lineitem, 6M docs).

This is the r12/r13 "31-query sf10 sweep" as a reusable tool instead
of an ad-hoc script: the CURATED set below is every bench family with
a distinct scale behavior (scan-bound TPC-H shapes, shuffle-bound
dedup/ANN, the corpus-wide text aggregates, streaming gates, the full
training_set composition), excluding by design the guard-refusing raw
pair/graph forms and the fixture-bounded codec queries
(artifacts/README.md documents each exclusion). One pass, per-query
wall seconds via a noop write (full computation, no driver collect).

Usage:
    python tools/bench_scaled.py [--json OUT.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

#: one per scale-behavior family — same set as BENCH_sf10_r12.json
SCALE_CRITICAL = [
    "flagship", "join_unique", "except_anti", "top_k",
    "agg_pricing_summary", "window_running", "map_derive",
    "events_session", "events_tumbling", "stream_tumbling",
    "stream_interval", "asof_join", "range_join",
    "dedup_exact", "dedup_minhash_fast", "dedup_ngram_fast",
    "semantic_dedup", "dedup_keep_best_fast",
    "sim_topk", "ivf_seeded", "kmeans",
    "tfidf", "bm25", "ccnet_buckets",
    "source_mix", "pack_sequences", "pagerank_reps", "rfm",
    "tpch_q3_shipping", "tpch_q9_profit", "training_set",
]


def main() -> int:
    args = sys.argv[1:]
    out_json = None
    # accept --json anywhere, and fail with usage (not IndexError)
    # when its operand is missing (r13 review)
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: bench_scaled.py [--json OUT.json] "
                  "[sf_dir] [query ...]", file=sys.stderr)
            return 2
        out_json = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else os.path.join(ROOT, ".localdata", "sf10")
    names = args[1:] or SCALE_CRITICAL

    import __spark_entry__ as entry_mod
    from csvplus_spark import get_spark

    spark = get_spark("bench-scaled")
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    failures = 0
    for name in names:
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            timings[name] = round(time.time() - t0, 2)
            print(f"{name}: {timings[name]}s", flush=True)
        except Exception as exc:
            timings[name] = -1.0
            failures += 1
            print(f"{name}: FAILED {exc}", file=sys.stderr, flush=True)
    total = round(sum(t for t in timings.values() if t > 0), 1)
    payload = {
        "metric": "sf10_scale_critical_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "note": ("shipped tree; curated scale-critical set "
                 "(guard-refusing raw forms and pair-explosion shapes "
                 "excluded by design)"),
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps({k: payload[k] for k in
                      ("metric", "value", "unit", "sf")}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
