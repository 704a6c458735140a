"""Dump the formatted physical plan of selected headline queries to
docs/PLANS.md — reviewable evidence that the optimizations SCALE.md
claims are in the actual plans.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOW = [
    ("select_project", "filter pushdown + column pruning at the parquet scan"),
    ("join_unique", "dimension index join → broadcast-hash"),
    ("except_anti", "Except → BroadcastHashJoin LeftAnti"),
    ("top_k", "IndexOn+Top → TakeOrderedAndProject (no global sort)"),
    ("agg_pricing_summary", "partial (map-side) + final hash aggregation"),
    ("tpch_q5_volume", "5-way star join: broadcast dims, single fact shuffle"),
    ("dedup_minhash", "minhash signatures + banded LSH candidate join"),
    ("dedup_embedding", "exact near-pairs via block-grid equi-join (no BNLJ)"),
    ("dedup_embedding_lsh", "sign-LSH buckets + exact rerank (equi-join only)"),
    ("simhash_pairs", "pigeonhole chunk blocking over DISTINCT hashes → "
                      "(chunk,value) equi-join + output-sized expansion"),
    ("rand_proj", "JL projection: zero-shuffle scan with pruned columns"),
    ("chunk_docs", "token chunking: zero-shuffle per-row explode+slice"),
    ("pack_sequences", "per-shard packing window: one shard-keyed shuffle"),
    ("flagship", "full compat chain — all JVM, no Python eval nodes"),
    ("take_while", "scalar-cutoff: TakeOrderedAndProject top-1 subquery + "
                   "parallel filter (no global-window latch)"),
    ("drop_offset", "Drop(n): top-n cutoff subquery + parallel filter + "
                    "tie-group resolution (no global sort+offset)"),
    ("pii_scrub", "typed PII redaction: zero-shuffle chained regexp_replace"),
    ("boilerplate", "boilerplate-line removal: broadcast anti-join + "
                    "per-doc array reassembly (no window)"),
    ("token_budget_mix", "mixture curation: per-group bigint running-sum "
                         "window, one shuffle keyed by source"),
    ("rarity", "mean inverse token frequency: explode + vocab agg + "
               "equi-join, N as scalar subquery"),
    ("top_ties", "FETCH FIRST WITH TIES: scalar-cutoff filter, no rank "
                 "window"),
    ("gopher_quality", "Gopher rules: one explode + one doc-keyed hash "
                       "aggregate, integer-count rule evaluation"),
    ("source_mix", "composition report: map-combined low-card aggregate, "
                   "total tokens as scalar subquery"),
    ("knn_label", "kNN label vote: cogrouped BLAS cells → candidate "
                  "equi-joins → fold-cosine rescore (no |q|-task funnel)"),
    ("tpch_q10_returns", "Q10: fact⋈fact on the shuffle key, 25-row nation "
                         "broadcast, NO hint on customer (scales with SF)"),
    ("snapshot_diff", "snapshot audit: full-outer equi-join over narrow "
                      "(id, fingerprint) projections"),
    ("global_shuffle", "global ROW_NUMBER without a one-task window: "
                       "1024-bucket counts + prefix offsets + per-bucket "
                       "row_number"),
    ("quality_topfrac", "top-fraction-per-group: (score, hash-bucket) "
                        "composite-bucket scalar cutoff, offsets broadcast"),
    ("repeated_spans", "ExactSubstr detection: span-keyed doc-frequency "
                       "aggregate + equi-join back (occurrence-linear)"),
    ("remove_spans", "ExactSubstr removal: sequence-explode coverage + "
                     "left-anti (doc,pos) join + per-doc reassembly"),
    ("dedup_minhash_fast", "duplication-immune MinHash: collapse → "
                           "rep-space LSH + verify → output-sized expansion"),
    ("tpch_q18_bigorders", "Q18: HAVING semi-join grouped on the already-"
                           "shuffled l_orderkey, no extra exchange"),
    ("pagerank_reps", "graph-after-dedup PageRank: exact-collapse "
                      "anti-dup pre-filter, then LSH pair graph + "
                      "integer rounds (the f²-edge-immune scale shape)"),
    ("multimodal_jpeg", "mixed PNG+JPEG decode: ONE Arrow mapInPandas "
                        "stage dispatching per-format pure-Python codecs"),
    ("bpe_counts", "merges-table BPE: Arrow mapInPandas count + in-plan "
                   "raise_error bounds + pinned-literal union"),
    ("approx_distinct", "HLL + exact in one pass over the pre-distinct "
                        "projection — Expand-free (r8: 4.5x)"),
    ("semantic_dedup", "SemDeDup: broadcast centroids, per-cell BLAS "
                       "prefilter (ArrowEvalPython group map), fold rescore, "
                       "CC joins"),
    ("multimodal_grid", "blob features → vectors → exact grid ANN: one "
                        "Arrow mapInPandas extraction, checkpointed tiny "
                        "vector table, cogrouped BLAS cells (no crossJoin)"),
    ("skew_report", "key-skew diagnostics: map-combined count agg + "
                    "broadcast single-row totals + TakeOrdered"),
    ("ann_recall", "recall@k eval: k-bounded equi-joins over two top-k "
                   "tables"),
    ("unigram_lm", "corpus-unigram LM score: vocab agg + term join + "
                   "per-doc ordered fold, N as scalar subquery"),
    ("bm25", "BM25: tf/df/dl aggregates + term join + per-doc top-k "
             "window, N and avgdl as scalar subqueries"),
    ("tpch_q7_volume", "Q7: nation dims pre-filtered + broadcast, "
                       "disjunctive direction predicate, two fact joins"),
    ("tpch_q20_promosupp", "Q20: aggregate→threshold→distinct → broadcast "
                           "LeftSemi into the supplier dim"),
    ("winsorize", "winsorization: two-quantile group agg broadcast back, "
                  "no per-row window"),
    ("cms_topk", "count-min sketch: one (row,bucket) map-combined agg → "
                 "32 KB cell table, broadcast estimate joins"),
    ("leakage_split", "cluster-keyed split: collapsed CC + output-sized "
                      "join + stateless hash label"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from csvplus_spark import get_spark

    spark = get_spark("plan-dump")
    qs = e.queries()
    out = ["# PLANS — formatted physical plans of headline queries",
           "", f"Generated by tools/dump_plans.py at {sf_dir}. See docs/SCALE.md",
           "for the design arguments these plans substantiate.", ""]
    for name, why in SHOW:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"*{why}*", "", "```", buf.getvalue().strip(), "```", ""]
    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(SHOW)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
