"""Compositional sf1 correctness for the pair/cluster operators whose
DuckDB oracles are quadratic (VERDICT r5 item 3 triage).

The 10x dataset (tools/make_scaled_sf.py) is TEN KEY-SHIFTED COPIES of
sf0.1 with identical payloads: doc c of base doc d has id d + c*OFF and
the SAME text/embedding. Every similarity function here depends only on
the payload, so the EXACT expected sf1 answer is derivable from the
already-oracle-validated sf0.1 output:

  * pair queries (ngram/minhash/simhash pairs, embedding pairs) —
    each base pair (a, b, v) expands to the 100 copy combinations
    (a + i*OFF, b + k*OFF, v) with the value UNCHANGED (same payloads
    -> bit-identical arithmetic), plus the 45 intra-copy self pairs
    per eligible base doc at the identity value (jaccard 1.0 /
    hamming 0 / sim cosine(v, v)). Eligibility = the doc participates
    in the operator's candidate space at all (>=1 shingle for the
    shingle family, >=1 token for simhash, self-sim >= threshold for
    embeddings — copies always share every LSH bucket/band since the
    signature is a pure function of the payload).
  * labeling queries (reps/clusters/canonicalize) — an sf1 component
    is exactly the copy-closure of a base component, so its min-id /
    best-quality representative is the BASE representative (copy 0
    sorts first at equal quality).
  * training_set — exact dedup keeps the min id per fingerprint, which
    eliminates every non-zero copy before any later stage, so the sf1
    output must equal the sf0.1 output bit-for-bit.

Comparison is a Spark-side order-insensitive digest (count + two
salted xxhash64 sums over the canonicalized row string), so nothing
quadratic is ever collected to the driver.

Usage: python tools/check_sf1_compose.py [--json OUT.json] \
           [--base /root/testdata/sf0.1] [--big /root/repo/.localdata/sf1] \
           [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OFF = 10_000_000
COPIES = 10


def digest(df: DataFrame) -> tuple:
    """Order-insensitive content digest: (rows, sum xxh64(row), sum
    salted xxh64(row)) over the row canonicalized as sorted-by-name
    columns cast to string with an explicit NULL token."""
    cols = sorted(df.columns)
    parts = []
    for c in cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("␀")))
    s = F.concat_ws("\x1f", *parts)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(s)).alias("h1"),
        F.sum(F.xxhash64(F.lit("salt2"), s)).alias("h2"),
    ).collect()[0]
    return (row["n"] or 0, row["h1"], row["h2"], tuple(cols))


def _combos(spark, cross: bool) -> DataFrame:
    """(i, k) copy combinations: all 100 for cross-pair expansion, or
    the 45 ordered i<k pairs for intra-copy self pairs."""
    rows = [(i, k) for i in range(COPIES) for k in range(COPIES)
            if cross or i < k]
    return F.broadcast(spark.createDataFrame(rows, "i long, k long"))


def expand_pairs(base: DataFrame, id1: str, id2: str) -> DataFrame:
    """All 100 copy combinations of each base pair, reoriented so
    id1 < id2 (offsets dominate the base ids, so orientation flips
    exactly when i > k)."""
    spark = base.sparkSession
    val_cols = [c for c in base.columns if c not in (id1, id2)]
    a = F.col(id1) + F.col("i") * F.lit(OFF)
    b = F.col(id2) + F.col("k") * F.lit(OFF)
    return (
        base.crossJoin(_combos(spark, cross=True))
        .select(F.least(a, b).alias(id1), F.greatest(a, b).alias(id2),
                *val_cols)
    )


def self_pairs(ids: DataFrame, id1: str, id2: str, **values) -> DataFrame:
    """The 45 intra-copy pairs per eligible base id. ``ids`` has one
    column (the base id); ``values`` are extra literal/carried columns
    (pass a Column or a ready value column name present in ids)."""
    spark = ids.sparkSession
    key = ids.columns[0]
    out = (
        ids.crossJoin(_combos(spark, cross=False))
        .select((F.col(key) + F.col("i") * F.lit(OFF)).alias(id1),
                (F.col(key) + F.col("k") * F.lit(OFF)).alias(id2),
                *[v.alias(name) if isinstance(v, F.Column) else F.col(v).alias(name)
                  for name, v in values.items()])
    )
    return out


def expand_rows(base: DataFrame, shift_cols: list[str]) -> DataFrame:
    """Every base row repeated once per copy with ``shift_cols``
    shifted by c*OFF and everything else unchanged."""
    spark = base.sparkSession
    copies = F.broadcast(spark.createDataFrame(
        [(c,) for c in range(COPIES)], "c long"))
    sel = [
        (F.col(c) + F.col("c") * F.lit(OFF)).alias(c) if c in shift_cols
        else F.col(c)
        for c in base.columns
    ]
    return base.crossJoin(copies).select(*sel)


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    base_dir, big_dir = "/root/testdata/sf0.1", "/root/repo/.localdata/sf1"
    only = set()
    while args:
        if args[0] == "--json":
            json_out = args[1]; args = args[2:]
        elif args[0] == "--base":
            base_dir = args[1]; args = args[2:]
        elif args[0] == "--big":
            big_dir = args[1]; args = args[2:]
        elif args[0] == "--copies":
            # sf10 = 100 key-shifted copies of sf0.1 (same OFF); the
            # laws are copy-count-generic (r9 VERDICT task 4)
            global COPIES
            COPIES = int(args[1]); args = args[2:]
        else:
            only.add(args.pop(0))

    import __spark_entry__ as e
    from csvplus_spark import get_spark, load_table
    from csvplus_spark.operators.dedup import shingle_pairs
    from csvplus_spark.operators.similarity import cosine, with_double_vec
    from csvplus_spark.operators.text import simhash_table

    spark = get_spark("sf1-compose-check")
    qs = e.queries()

    docs_base = load_table(spark, base_dir, "documents").df
    # eligibility sets, computed once from the base tables
    shingled = shingle_pairs(docs_base).select(
        F.col("__id__").alias("doc_id")).distinct().localCheckpoint()
    tokened = simhash_table(docs_base).select("doc_id").localCheckpoint()
    emb_base = with_double_vec(load_table(spark, base_dir, "embeddings").df)
    emb_self = emb_base.select(
        "vec_id", cosine(F.col("__vec__"), F.col("__vec__")).alias("sim")
    ).filter(F.col("sim") >= 0.4).localCheckpoint()

    def run(name):
        return qs[name](spark, base_dir)

    def expected_for(name) -> DataFrame:
        if name == "dedup_ngram":
            return expand_pairs(run(name), "doc_id_1", "doc_id_2").unionByName(
                self_pairs(shingled, "doc_id_1", "doc_id_2",
                           jaccard=F.lit(1.0)))
        if name == "dedup_minhash":
            return expand_pairs(run(name), "doc_id_1", "doc_id_2").unionByName(
                self_pairs(shingled, "doc_id_1", "doc_id_2",
                           jaccard=F.lit(1.0)))
        if name == "simhash":
            return expand_rows(run(name), ["doc_id"])
        if name in ("simhash_pairs", "simhash_pairs60"):
            return expand_pairs(run(name), "doc_id_1", "doc_id_2").unionByName(
                self_pairs(tokened, "doc_id_1", "doc_id_2",
                           hamming=F.lit(0).cast("integer")))
        if name == "simhash_reps60":
            out = run(name)
            # (doc_id, rep_id): copies join their base component, whose
            # min id is the base rep (copy 0 of it)
            return expand_rows(out, ["doc_id"])
        if name in ("dedup_clusters", "dedup_clusters_fast"):
            out = run(name)
            in_pairs = out.select("doc_id")
            singles = shingled.join(in_pairs, "doc_id", "left_anti") \
                .select("doc_id", F.col("doc_id").alias("cluster_id"))
            return expand_rows(out.unionByName(singles), ["doc_id"])
        if name == "canonicalize":
            out = run(name)
            s = out.join(shingled, "doc_id")
            lonely = out.join(shingled, "doc_id", "left_anti")
            exp = expand_rows(s, ["doc_id"]).unionByName(
                expand_rows(lonely, ["doc_id", "cluster_id", "canonical_id"]))
            return exp.withColumn(
                "keep", F.col("doc_id") == F.col("canonical_id"))
        if name == "training_set":
            # copies die in exact dedup: sf-f == base bit-for-bit —
            # including the r9 centrality column (the post-exact-dedup
            # graph is the base graph)
            return run(name)
        if name == "dedup_exact":
            # sf-f fingerprint group = base group x copies; min id =
            # base canonical (copy 0: offsets dominate)
            out = run(name)
            copies = F.broadcast(spark.createDataFrame(
                [(c,) for c in range(COPIES)], "c long"))
            return out.crossJoin(copies).select(
                (F.col("doc_id") + F.col("c") * F.lit(OFF)).alias("doc_id"),
                F.col("canonical_id"),
                (F.col("is_canonical") & (F.col("c") == 0))
                .alias("is_canonical"))
        if name == "dedup_ngram_fast":
            # byte-identical-to-plain contract: the dedup_ngram law
            return expand_pairs(run(name), "doc_id_1", "doc_id_2").unionByName(
                self_pairs(shingled, "doc_id_1", "doc_id_2",
                           jaccard=F.lit(1.0)))
        if name == "dedup_minhash_fast":
            return expand_pairs(run(name), "doc_id_1", "doc_id_2").unionByName(
                self_pairs(shingled, "doc_id_1", "doc_id_2",
                           jaccard=F.lit(1.0)))
        if name == "dedup_containment_fast":
            # self-containment of a shingled doc's copies is exactly 1.0
            return expand_pairs(run(name), "doc_id_1", "doc_id_2").unionByName(
                self_pairs(shingled, "doc_id_1", "doc_id_2",
                           containment=F.lit(1.0)))
        if name == "dedup_keep_best_fast":
            # components are copy-closures: same cluster_id (min id =
            # copy 0), same best-quality rep (equal quality ties break
            # to the min id = copy 0), same score, members x COPIES
            out = run(name)
            return out.select(
                "cluster_id", "rep_id", "rep_score",
                (F.col("n_members") * F.lit(COPIES))
                .cast(dict(out.dtypes)["n_members"]).alias("n_members"))
        if name == "fuzzy_join_fast":
            # KEY_OFFSET is even, so copies keep their parity side:
            # expansion preserves left/right roles (never reorients),
            # and there are no intra-copy self pairs across sides
            combos = _combos(spark, cross=True)
            return run(name).crossJoin(combos).select(
                (F.col("left_id") + F.col("i") * F.lit(OFF))
                .alias("left_id"),
                (F.col("right_id") + F.col("k") * F.lit(OFF))
                .alias("right_id"),
                F.col("jaccard"))
        if name == "ccnet_buckets":
            # (n_tokens, lp_mean) are payload-pure AND duplication-
            # invariant: MLE unigram probs are ct/total; (k·ct)/(k·total)
            # is bit-identical in IEEE double (both operands exact
            # integers < 2^53, same real quotient, division correctly
            # rounded), so log + the position-ordered fold + rounding
            # all reproduce per copy. The BUCKET is NOT invariant: the
            # percentile index over the k-replicated multiset can land
            # inside a tie-run of copies and collapse the interpolated
            # threshold onto the lower order stat, flipping boundary-
            # valued docs. So the law expands the base-oracle-validated
            # SCORES and re-derives thresholds + labels over the
            # expanded multiset with the same (base-validated)
            # bucketing tail — this checks that the 50M-token explode +
            # vocab aggregate + fold compose at scale.
            from csvplus_spark.operators.text import ccnet_bucket_scores
            base_scores = run(name).drop("bucket")
            return ccnet_bucket_scores(expand_rows(base_scores, ["doc_id"]))
        if name == "leakage_split":
            # sf-f clusters are exactly copy-closures (an edge needs
            # jaccard >= 0.6 between payloads, so any cross-component
            # sf-f edge would imply a base edge), and the closure's min
            # id is the base cluster_id (copy 0: offsets dominate) —
            # so SHINGLED docs keep their base (cluster_id, split)
            # verbatim; shingled singletons pair with their own copies
            # (J=1) into a cluster whose min id equals the base
            # coalesce value, same label. NON-shingled docs never enter
            # the candidate space (dup_clusters_collapsed membership
            # contract: copies' J=1 pairs need >= 1 shingle), so each
            # copy stays its own singleton cluster at a SHIFTED id and
            # its split label re-hashes.
            from csvplus_spark.operators.sampling import train_val_test_split
            out = run(name)
            s = out.join(shingled, "doc_id")
            lonely = out.join(shingled, "doc_id", "left_anti").drop("split")
            return expand_rows(s, ["doc_id"]).unionByName(
                train_val_test_split(
                    expand_rows(lonely, ["doc_id", "cluster_id"]),
                    "cluster_id"))
        if name in ("dedup_embedding", "dedup_embedding_lsh"):
            return expand_pairs(run(name), "id_1", "id_2").unionByName(
                self_pairs(emb_self.select("vec_id", "sim"), "id_1", "id_2",
                           sim="sim"))
        if name == "semantic_dedup":
            # Collapse-identity law (VERDICT r6 item 2). Both runs use
            # n_cells = 16 * COPIES: the sf1 seeds (lowest 160 ids) are
            # then copy-0 of the base run's own 160 seeds — identical
            # centroid VECTORS with identical cell ids — so copy c of
            # vector v gets v's exact d² ties and lands in v's cell.
            # Within a cell the edge set is the base edge set expanded
            # over copy combos plus the sim-1 identity pairs between
            # copies, so each sf1 component is the copy-closure of a
            # base component and its min id is the base canonical
            # (copy 0: offsets dominate). Zero-norm vectors have NULL
            # cosine everywhere (0/0) — singletons per copy, exactly as
            # at base. The base-160 run is fresh (the oracle pins 16),
            # so this checks SCALE CONSISTENCY of blocking + BLAS
            # prefilter + rescore + CC, not base correctness (the 16-
            # cell DuckDB oracle owns that).
            from csvplus_spark.operators.dedup import semantic_dedup
            base_out = semantic_dedup(
                load_table(spark, base_dir, "embeddings").df, 0.4,
                n_cells=16 * COPIES)
            nz = base_out.join(emb_self.select("vec_id"), "vec_id")
            zn = base_out.join(emb_self.select("vec_id"), "vec_id",
                               "left_anti")
            copies = F.broadcast(spark.createDataFrame(
                [(c,) for c in range(COPIES)], "c long"))
            exp_nz = nz.crossJoin(copies).select(
                (F.col("vec_id") + F.col("c") * F.lit(OFF)).alias("vec_id"),
                F.col("canonical_id"),
                (F.col("is_canonical") & (F.col("c") == 0))
                .alias("is_canonical"))
            return exp_nz.unionByName(
                expand_rows(zn, ["vec_id", "canonical_id"]))
        if name == "knn_label":
            # Copy-closure of neighbor sets (r11 verdict item 4),
            # valid only when COPIES > k=10: each copy's 10 nearest
            # neighbors are 10 of its own COPIES-1 identical copies —
            # cosine is EXACTLY 1.0 (identical float payloads give
            # identical dot/norm arithmetic) and no other payload
            # reaches 1.0 (verified: zero zero-norm vectors, zero
            # duplicate payloads in the base table) — so every
            # duplicated id predicts its BASE label with a unanimous
            # 10 votes, regardless of WHICH copies win the id
            # tie-break. This pins grid_topk's cell blocking +
            # candidate generation + top-k + vote at 2M vectors; the
            # base DuckDB oracle owns base correctness (its SQL
            # replay is train x test quadratic and exceeds the box at
            # sf10 — artifacts/README.md r11 note).
            if COPIES <= 10:
                raise ValueError("knn_label law needs COPIES > k=10")
            emb = load_table(spark, base_dir, "embeddings").df
            base = emb.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").cast("int").alias("pred_label"),
                F.lit(10).cast("long").alias("votes"))
            return expand_rows(base, ["query_id"])
        if name in ("pagerank_reps", "kcore_reps", "triangles_reps"):
            # graph-after-dedup identity (r12): exact dedup keeps the
            # MIN id per text fingerprint and copies share the
            # fingerprint, so the sf-f canonical set IS the base
            # canonical set (copy 0, base ids, same texts) — the rep
            # near-dup graph and the integer trajectory/counts replay
            # bit-for-bit. Pins that collapse-first really is
            # duplication-immune END-TO-END at 100x, not just argued.
            return run(name)
        if name == "edit1_names":
            # p_name is copy-VERBATIM (make_scaled_sf shifts only
            # p_partkey) and the operator pairs DISTINCT VALUES, so
            # the output at any duplication factor is exactly the
            # base output — this pins that the engine's value-level
            # distinct + deletion-neighborhood join hold at 100x
            # input. (The DuckDB oracle is a brute-force all-pairs
            # replay — the documented sf10 capacity exclusion.)
            return run(name)
        if name == "asof_join":
            # copies co-shift (event_id, user_id) and share every
            # timestamp/value, so copy c of a user sees exactly the
            # base purchase history (its own copy-c purchases) and
            # each copy's strictly-prior as-of pick equals the base
            # row's: ids shift, payload columns verbatim
            return expand_rows(run(name), ["event_id", "user_id"])
        if name == "range_join":
            # copies co-shift (event_id, user_id) but share all
            # timestamps, so copy c of event e has 100 copies of
            # every base event within +-60s as candidates; the
            # same-USER exclusion only bites at matching copy index
            # (u + i*OFF == u' + k*OFF forces u=u', i=k since base
            # user ids << OFF): n_nearby(e_c) = COPIES*N_all(e) -
            # N_same(e), with N_all/N_same counted self-INCLUSIVE at
            # base scale through the operator's own banded join.
            # Every sf10 row is >= COPIES-1 (own copies are "other
            # users"), so the base query's 0-coalesce never fires.
            from csvplus_spark.operators.rangejoin import \
                within_range_join
            ev = load_table(spark, base_dir, "events").df.select(
                "event_id", "user_id", F.unix_micros("ts").alias("us"))
            l = ev.select(F.col("event_id").alias("eid"),
                          F.col("user_id").alias("uid"),
                          F.col("us").alias("lus"))
            r = ev.select(F.col("event_id").alias("rid"),
                          F.col("user_id").alias("ruid"),
                          F.col("us").alias("rus"))
            j = within_range_join(l, r, "lus", "rus", 60_000_000.0)
            per = j.groupBy("eid").agg(
                F.count(F.lit(1)).alias("n_all"),
                F.sum((F.col("uid") == F.col("ruid")).cast("long"))
                .alias("n_same"))
            base = per.select(
                F.col("eid").alias("event_id"),
                (F.lit(COPIES) * F.col("n_all") - F.col("n_same"))
                .alias("n_nearby"))
            return expand_rows(base, ["event_id"])
        raise KeyError(name)

    names = ["dedup_ngram", "dedup_minhash", "simhash", "simhash_pairs",
             "simhash_pairs60", "simhash_reps60", "dedup_clusters",
             "dedup_clusters_fast", "canonicalize", "training_set",
             "dedup_embedding", "dedup_embedding_lsh", "semantic_dedup",
             "dedup_exact", "dedup_ngram_fast", "dedup_minhash_fast",
             "dedup_containment_fast", "dedup_keep_best_fast",
             "fuzzy_join_fast", "ccnet_buckets", "leakage_split",
             "knn_label",  # --copies > 10 only (law guard)
             "edit1_names", "asof_join", "range_join",
             "pagerank_reps", "kcore_reps", "triangles_reps"]
    # NB at --copies 100 (sf10) restrict the run to the collapse
    # family + labelings + training_set via the [query ...] args: the
    # PLAIN pair/cluster paths are documented sf3+ disk failures
    # (SCALE.md), and the CAPPED simhash_pairs60 deliberately departs
    # from the uncapped expansion law once groups exceed the cap
    # (its bounded output is pinned by test_simhash_pair_cap instead)

    def actual_for(name) -> DataFrame:
        if name == "semantic_dedup":
            # not the entry query: the law requires the same 160-seed
            # blocking on both sides (see expected_for)
            from csvplus_spark.operators.dedup import semantic_dedup
            return semantic_dedup(
                load_table(spark, big_dir, "embeddings").df, 0.4,
                n_cells=16 * COPIES)
        return qs[name](spark, big_dir)

    report, failures = {}, 0
    for name in names:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            exp = digest(expected_for(name))
            t_exp = time.time() - t0
            t1 = time.time()
            act = digest(actual_for(name))
            t_act = time.time() - t1
            ok = exp == act
        except Exception as ex:
            print(f"FAIL  {name}: error: {ex}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"compose: {ex}"[:200]}
            failures += 1
            continue
        report[name] = {
            "rows_match": act[0] == exp[0],
            "schema_match": act[3] == exp[3],
            "hash_match": act[1:3] == exp[1:3],
            "spark_rows": act[0], "oracle_rows": exp[0],
            "err": None if ok else "compositional digest mismatch",
        }
        if ok:
            print(f"PASS  {name} ({act[0]} rows; expected {t_exp:.1f}s"
                  f" + sf1 {t_act:.1f}s)")
        else:
            failures += 1
            print(f"FAIL  {name}: sf1 {act[:3]} vs expected {exp[:3]}")
    spark.stop()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
    print("sf1-compose:", "ALL PASS" if not failures else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
