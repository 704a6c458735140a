"""Deduplication operators for LLM-data pipelines (BASELINE.json
north-star): exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the point of each shape):
  * exact        — one hash-aggregate on a 128-bit fingerprint; the
    only shuffle key is the fingerprint, never the text.
  * ngram-jaccard — candidate generation by shared-shingle blocking
    (explode + self-equi-join on the shingle), so cost is
    Σ |bucket|², not n²; exact verify on the candidates only.
  * minhash-lsh  — per-doc signature is one narrow pass (array ops in
    codegen); candidates via equi-join on (band, signature); exact
    Jaccard verify on candidates. At 100 TB the band join is the only
    shuffle and it is keyed by (band, sig) — uniformly distributed by
    construction (hash values), so no skew.
  * simhash      — see text.simhash_table; near-dup = equal hash (or
    small Hamming distance via bit_count(xor)).

All hashes are md5-derived (text.hash60) → every operator is
bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, hash60, tokens

SHINGLE_K = 3


def shingles(col: str = "text", k: int = SHINGLE_K) -> F.Column:
    """Distinct word k-gram shingles (space-joined), 1-based indexing
    to mirror DuckDB list semantics exactly."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(F.array().cast("array<string>")))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: every doc mapped
    to the smallest doc id sharing its fingerprint (canonical id).
    One groupBy on a 32-char key — the 100 TB-safe exact dedup."""
    fp = df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    canon = fp.groupBy("fp").agg(F.min(id_col).alias("canonical_id"))
    return (
        fp.join(canon, "fp")
        .select(F.col(id_col), F.col("canonical_id"),
                (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"))
    )


def _shingle_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("__id__"),
                     shingles(text_col).alias("__sh__"))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT near-dup pairs: Jaccard over word-trigram shingle sets.

    Blocking on shared shingles keeps this far below n² (only pairs
    that share ≥1 shingle are scored); the equi-join + count is one
    shuffle keyed by shingle. Returns (doc_id_1, doc_id_2, jaccard).
    """
    sh = _shingle_table(df, text_col, id_col).cache()
    ex = sh.select("__id__", F.explode("__sh__").alias("__s__"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"),
              (F.col("a.__s__") == F.col("b.__s__"))
              & (F.col("a.__id__") < F.col("b.__id__")))
        .groupBy(F.col("a.__id__").alias("d1"), F.col("b.__id__").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.select("__id__", F.size("__sh__").alias("n"))
    out = (
        inter.join(sizes.alias("s1"), F.col("d1") == F.col("s1.__id__"))
        .join(sizes.alias("s2"), F.col("d2") == F.col("s2.__id__"))
        .withColumn("jaccard",
                    F.col("inter") / (F.col("s1.n") + F.col("s2.n") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("d1").alias("doc_id_1"), F.col("d2").alias("doc_id_2"), "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc MinHash signature: for seed s, min over shingles of
    hash60(s || '|' || shingle). One narrow pass, all in codegen.
    Returns (id, seed, sig) exploded — join-ready LSH buckets."""
    def _seeded(seed: int):
        prefix = f"{seed}|"

        def h(x):
            return hash60(F.concat(F.lit(prefix), x))

        return h

    sh = _shingle_table(df, text_col, id_col)
    sigs = []
    for s in range(num_hashes):
        sigs.append(
            F.struct(
                F.lit(s).alias("seed"),
                F.array_min(F.transform(F.col("__sh__"), _seeded(s))).alias("sig"),
            )
        )
    return (
        sh.filter(F.size("__sh__") > 0)
        .select("__id__", F.explode(F.array(*sigs)).alias("b"))
        .select(F.col("__id__").alias("id"),
                F.col("b.seed").alias("seed"), F.col("b.sig").alias("sig"))
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    num_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified.

    Single-hash bands (r=1, b=num_hashes): a pair is a candidate when
    ANY of the ``num_hashes`` minhashes collide, so the miss
    probability for a true pair at Jaccard J is (1−J)^b — ~1e-13 at
    J=0.6, b=32 — which is what makes the result deterministic enough
    to oracle-check. False candidates are removed by the exact-Jaccard
    verify, so extra candidates cost time, never correctness.
    """
    sigs = minhash_signatures(df, num_hashes, text_col, id_col)
    cand = (
        sigs.alias("a")
        .join(sigs.alias("b"),
              (F.col("a.seed") == F.col("b.seed"))
              & (F.col("a.sig") == F.col("b.sig"))
              & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("d1"), F.col("b.id").alias("d2"))
        .distinct()
    )
    sh = _shingle_table(df, text_col, id_col)
    out = (
        cand.join(sh.alias("s1"), F.col("d1") == F.col("s1.__id__"))
        .join(sh.alias("s2"), F.col("d2") == F.col("s2.__id__"))
        .withColumn("inter", F.size(F.array_intersect(F.col("s1.__sh__"), F.col("s2.__sh__"))))
        .withColumn("jaccard",
                    F.col("inter")
                    / (F.size(F.col("s1.__sh__")) + F.size(F.col("s2.__sh__")) - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("d1").alias("doc_id_1"), F.col("d2").alias("doc_id_2"), "jaccard")
    )
    return out


def simhash_dup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_bits: int = 32) -> DataFrame:
    """Docs sharing an identical SimHash → same near-dup group."""
    from .text import simhash_table

    sh = simhash_table(df, text_col, id_col, n_bits)
    canon = sh.groupBy("simhash").agg(F.min(id_col).alias("canonical_id"))
    return sh.join(canon, "simhash").select(id_col, "simhash", "canonical_id")


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       n_bits: int = 32, block_col: str | None = None) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    All-pairs within ``block_col`` blocks (or global for small n);
    production path at scale is blocking on simhash byte-chunks —
    provided here as the simple exact form with bit_count(xor).
    """
    from .text import simhash_table

    sh = simhash_table(df, text_col, id_col, n_bits)
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    pairs = a.join(b, cond)
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col(f"a.{id_col}").alias("doc_id_1"),
                F.col(f"b.{id_col}").alias("doc_id_2"), "hamming")
    )
