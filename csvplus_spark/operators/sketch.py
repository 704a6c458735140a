"""Frequency sketches for corpus-scale counting (BASELINE.json
north-star; no reference counterpart — the reference is a CSV ETL
library).

Count-min sketch (Cormode & Muthukrishnan 2005): d independent hash
rows × w buckets of integer counts. Every update/estimate uses the
md5-derived ``hash60`` (operators/text.py) so the whole sketch —
build AND estimates — is bit-identical across Spark and DuckDB and
therefore oracle-checkable, unlike a seeded-random implementation.

Scale shape: the sketch is ONE groupBy over (row, bucket) — d·w cells
(4×1024 by default: 32 KB) regardless of corpus size — so it
broadcasts anywhere, composes with streaming foreachBatch merges
(cell-wise sum), and estimating any term set is a broadcast join
against the cell table. The classic use: heavy-hitter candidates and
frequency estimates without a corpus-wide distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import hash60, tokens


def _bucket(row: int, term_col, w: int):
    """Bucket of ``term`` in hash row ``row`` — md5-derived, engine-
    portable: hash60('r|' || term) % w."""
    return F.pmod(hash60(F.concat(F.lit(f"{row}|"), term_col)),
                  F.lit(w))


def cms_build(df: DataFrame, term_col: str = "term", d: int = 4,
              w: int = 1024) -> DataFrame:
    """Build a count-min sketch over a term stream: returns the cell
    table ``(row, bucket, ct)`` with exactly the non-empty cells of
    the d×w grid. One map-combined aggregate; the term column never
    becomes a shuffle key wider than (row, bucket)."""
    cells = None
    for r in range(d):
        part = df.select(F.lit(r).cast("int").alias("row"),
                         _bucket(r, F.col(term_col), w).alias("bucket"))
        cells = part if cells is None else cells.unionAll(part)
    return (cells.groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("ct")))


def cms_estimate(sketch: DataFrame, terms: DataFrame,
                 term_col: str = "term", d: int = 4,
                 w: int = 1024) -> DataFrame:
    """Point-estimate each term's frequency: min over the d rows of
    its cell counts. The sketch is tiny — broadcast join per row.
    CMS guarantees est ≥ true count (one-sided error ≤ εN w.h.p.)."""
    out = terms
    for r in range(d):
        cell = sketch.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"__b{r}__"), F.col("ct").alias(f"__c{r}__"))
        out = out.join(
            F.broadcast(cell),
            _bucket(r, F.col(term_col), w) == F.col(f"__b{r}__"), "left")
    est = F.least(*[F.coalesce(F.col(f"__c{r}__"), F.lit(0))
                    for r in range(d)])
    return out.select(term_col, est.alias("cms_est"))


def cms_heavy_hitters(df: DataFrame, k: int = 20, d: int = 4,
                      w: int = 1024, text_col: str = "text") -> DataFrame:
    """Demo/validation composition over a document corpus: tokenize,
    build the sketch, take the EXACT top-k terms, and emit each with
    its exact count and CMS estimate — with the CMS one-sided bound
    (est ≥ exact, always, by construction) ENFORCED in-plan via
    raise_error, so the oracle row-match is meaningful (the
    approx_distinct pattern). Returns (term, exact_ct, cms_est,
    within_bound)."""
    term_stream = df.select(F.explode(tokens(text_col)).alias("term"))
    sketch = cms_build(term_stream, "term", d, w)
    exact = (term_stream.groupBy("term")
             .agg(F.count(F.lit(1)).alias("exact_ct")))
    # exact top-k, total order (count desc, term asc) — scalar-cutoff
    # not needed at k=20: TakeOrderedAndProject
    top = (exact.orderBy(F.col("exact_ct").desc(), F.col("term"))
           .limit(k))
    est = cms_estimate(sketch, top.select("term"), "term", d, w)
    return (
        top.join(F.broadcast(est), "term")
        .select(
            "term", "exact_ct",
            F.when(F.col("cms_est") >= F.col("exact_ct"), F.col("cms_est"))
            .otherwise(F.raise_error(
                F.concat(F.lit("CMS under-estimated term "), F.col("term")))
                .cast("long")).alias("cms_est"),
            F.lit(True).alias("within_bound"),
        )
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the SAME (d, w): cell-wise
    sum. CMS is a linear sketch, so building per-partition / per-day /
    per-micro-batch and merging is EXACTLY the sketch of the
    concatenated stream — the property that makes it a distributed
    rollup (combine per-executor sketches) and a streaming accumulator
    (foreachBatch += batch sketch) with no re-scan of history."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionAll(s)
    return (out.groupBy("row", "bucket")
            .agg(F.sum("ct").alias("ct")))


def bloom_build(df: DataFrame, term_col: str = "term", k: int = 4,
                m_bits: int = 1 << 16) -> DataFrame:
    """Deterministic Bloom filter over a term set: k md5-derived bit
    positions per term, OR-folded into an ``m_bits`` bitmap stored as
    a (word, bits) long table (≤ m_bits/64 rows — 8 KB at the 2^16
    default). At 100 TB this is THE decontamination shape: broadcast
    the benchmark's 8 KB Bloom to every executor and filter the corpus
    scan-side, instead of shuffling corpus shingles into a join.
    One-sided by construction: every inserted term tests positive;
    false-positive rate ≈ (1 − e^(−kn/m))^k. Engine-portable — bit
    positions, shifts, and bit_or are identical integer ops in Spark
    and DuckDB, so the exact bitmap is oracle-checkable."""
    pos = None
    for i in range(k):
        p = df.select(F.pmod(
            hash60(F.concat(F.lit(f"{i}|"), F.col(term_col))),
            F.lit(m_bits)).alias("__p__"))
        pos = p if pos is None else pos.unionAll(p)
    return (pos.select(
        (F.col("__p__") / 63).cast("long").alias("word"),
        # F.shiftleft takes a literal bit count — column shifts go
        # through the SQL form
        F.expr("shiftleft(CAST(1 AS BIGINT), "
               "CAST(__p__ % 63 AS INT))").alias("__m__"))
            .groupBy("word")
            .agg(F.bit_or("__m__").alias("bits")))


def bloom_contains(bloom: DataFrame, terms: DataFrame,
                   term_col: str = "term", k: int = 4,
                   m_bits: int = 1 << 16) -> DataFrame:
    """Membership test against a :func:`bloom_build` table: a term is
    (probably) present iff ALL k of its bit positions are set. The
    bloom table broadcasts; each of the k probes is a word equi-join.
    Adds ``in_bloom`` (boolean; definitely-false is exact)."""
    out = terms
    cond = None
    for i in range(k):
        p = F.pmod(hash60(F.concat(F.lit(f"{i}|"), F.col(term_col))),
                   F.lit(m_bits))
        w = bloom.select(F.col("word").alias(f"__w{i}__"),
                         F.col("bits").alias(f"__b{i}__"))
        out = out.withColumn(f"__p{i}__", p)
        out = out.join(F.broadcast(w),
                       (F.col(f"__p{i}__") / 63).cast("long")
                       == F.col(f"__w{i}__"), "left")
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                      f"CAST(__p{i}__ % 63 AS INT))")
        hit = (F.coalesce(F.col(f"__b{i}__"), F.lit(0))
               .bitwiseAND(mask) != 0)
        cond = hit if cond is None else (cond & hit)
    keep = [c for c in terms.columns]
    return out.select(*keep, cond.alias("in_bloom"))
