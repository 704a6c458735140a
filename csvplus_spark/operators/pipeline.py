"""End-to-end training-data pipeline: the composition a user of this
engine actually runs over a raw corpus (BASELINE.json north-star).

    ingest → quality filter → exact dedup → near-dup canonicalization
           → benchmark decontamination → deterministic split
           [→ graph-after-dedup centrality feature]

Every stage is one of the engine's first-class operators, so the whole
pipeline stays a single lazy DataFrame plan (no driver materialization
between stages) and — because each stage is hash-deterministic — the
COMPLETE composition is oracle-checkable bit-for-bit (driver query
``training_set``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_training_set(
    docs: DataFrame,
    probes: DataFrame | None = None,
    quality_min: float = 0.5,
    jaccard_threshold: float = 0.6,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_id: str = "probe_id",
    exclude_self_ids: bool = False,
    with_centrality: bool = False,
) -> DataFrame:
    """Returns (id, split) for every document that survives the
    pipeline. ``probes`` is the eval benchmark to decontaminate
    against (sharing ANY word trigram removes the doc);
    ``exclude_self_ids`` ignores probe rows whose id equals the doc id
    (for demos where probes are drawn from the corpus itself).

    ``with_centrality=True`` appends the graph-after-dedup stage
    (SCALE.md pipeline order, the ``pagerank_reps`` shape): integer
    PageRank over the MinHash near-dup graph of the POST-EXACT-DEDUP
    corpus, projected onto the surviving canonical docs as a
    ``centrality`` quality feature (0.0 for survivors with no
    near-dup edges). The graph input must be the pre-canonicalization
    set: canonicalization removes precisely the ≥threshold pairs, so
    a survivors-only graph is empty by construction; ranking the
    exact-dedup graph instead scores each surviving rep by how hub-
    like its near-dup neighborhood was. Because exact dedup already
    collapsed duplicates, the graph is collapse-sized — the shape the
    sf10 probe showed survives duplication factor 100 where
    raw-corpus graphs do not.

    Scale shape: quality + exact dedup are narrow/one-aggregate; the
    near-dup stage is the skew-proofed n-gram path; decontamination is
    one shingle equi-join with the probe side as build side; the split
    is a pure hash filter. Nothing here collects to the driver.
    """
    from .dedup import (canonicalize_clusters, contamination_check,
                        exact_dedup)
    from .sampling import train_val_test_split
    from .text import text_stats

    stats = text_stats(docs, text_col, id_col)
    d1 = docs.join(
        stats.filter(F.col("quality") >= quality_min).select(id_col), id_col)
    # r13 probe (guide §2.4): d1 fans out into exact_dedup AND the
    # canonical join probe, so the text_stats tokenize pass is planned
    # twice. A d1 localCheckpoint was measured at sf10 and NOT kept:
    # it adds a second full-text corpus materialization on top of the
    # existing d2 checkpoint, and the write+read of O(corpus) bytes
    # costs about what the saved tokenize pass does (interleaved A/B
    # inconclusive inside the box noise band). Shape left as-is.
    ex = exact_dedup(d1, text_col, id_col)
    d2 = d1.join(ex.filter(F.col("is_canonical")).select(id_col), id_col)
    sh2 = None
    if with_centrality:
        # d2 fans out into canonicalization AND the centrality graph —
        # checkpoint it so the quality/exact-dedup upstream runs once,
        # and shingle it ONCE: both the ngram canonicalization pairs
        # and the MinHash centrality pairs consume the same
        # shingle_pairs(d2) table (one tokenize+explode pass instead
        # of two — the dominant shared cost at corpus scale)
        d2 = d2.localCheckpoint(eager=False)
        from .dedup import ngram_jaccard_pairs, shingle_pairs

        sh2 = shingle_pairs(d2, text_col, id_col).localCheckpoint(
            eager=False)
        canon = canonicalize_clusters(
            d2, pairs=ngram_jaccard_pairs(d2, jaccard_threshold,
                                          text_col, id_col,
                                          shingles=sh2),
            threshold=jaccard_threshold,
            text_col=text_col, id_col=id_col)
    else:
        canon = canonicalize_clusters(d2, threshold=jaccard_threshold,
                                      text_col=text_col, id_col=id_col)
    d3 = d2.join(canon.filter(F.col("keep")).select(id_col), id_col)
    if probes is not None:
        cont = contamination_check(d3, probes, corpus_text=text_col,
                                   corpus_id=id_col, probe_id=probe_id)
        if exclude_self_ids:
            cont = cont.filter(F.col(id_col) != F.col(probe_id))
        d3 = d3.join(cont.select(id_col).distinct(), id_col, "left_anti")
    split = train_val_test_split(
        d3, id_col, val_fraction, test_fraction
    ).select(F.col(id_col), "split")
    if not with_centrality:
        return split
    from .dedup import minhash_dedup_pairs
    from .graph import integer_pagerank

    pr = integer_pagerank(
        minhash_dedup_pairs(d2, jaccard_threshold,
                            text_col=text_col, id_col=id_col,
                            shingles=sh2))
    return (split.join(pr, split[id_col] == pr["node"], "left")
            .select(F.col(id_col), "split",
                    F.coalesce(F.col("pr"), F.lit(0.0))
                    .alias("centrality")))


def write_training_shards(labeled: DataFrame, path: str, n_shards: int = 16,
                          id_col: str = "doc_id",
                          split_col: str = "split") -> None:
    """Materialize a split-labeled dataset as dataloader-ready shards:
    parquet partitioned by split, each split cut into ``n_shards``
    DETERMINISTIC shards (shard = hash60(id) % n, carried as a column
    and aligned with the file layout via repartition on it).

    Deterministic sharding — unlike round-robin repartition — means a
    re-run after appending data keeps every existing row in the same
    shard, so downstream dataloader checkpoints stay valid.
    """
    from .text import hash60

    shard = (hash60(F.col(id_col).cast("string")) % n_shards).cast("int")
    (
        labeled.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy(split_col, "shard")
        .parquet(path)
    )
