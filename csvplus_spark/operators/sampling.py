"""Deterministic sampling and dataset splitting for training-data
pipelines (BASELINE.json north-star; no reference counterpart).

Everything is hash-based (md5 via text.hash60), never RNG-based:
  * reproducible across runs, engines, and partitionings (Spark's
    df.sample depends on partition layout — useless for auditable
    pipeline reruns);
  * membership is a pure function of the row key, so a re-run after
    adding data keeps every previously-sampled row in the same
    bucket/split (stable incremental sampling).

Scale: a narrow filter on a hash of the key — pushes into the scan
pipeline, zero shuffles.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash60

#: bucket resolution: fractions are quantized to 1/10000
BUCKETS = 10_000


def _bucket(key_cols: Sequence[str], salt: str) -> Column:
    key = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    return hash60(key) % BUCKETS


def _quantize(fraction: float) -> int:
    """Nearest-bucket threshold (round, not truncate: 0.29 → 2900,
    not 2899 from float representation error)."""
    return int(round(fraction * BUCKETS))


def hash_sample(df: DataFrame, key_cols: Sequence[str] | str,
                fraction: float, salt: str = "sample") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key hash."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return df.filter(_bucket(key_cols, salt) < _quantize(fraction))


def stratified_hash_sample(df: DataFrame, strata_col: str,
                           key_cols: Sequence[str] | str,
                           fractions: Mapping[str, float],
                           default_fraction: float = 0.0,
                           salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic sampling, e.g. language rebalancing:
    ``{"en": 0.1, "zh": 1.0}`` downsamples English 10× and keeps all
    Chinese — the standard data-mixing primitive."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    rate = None
    for value, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        lit = F.lit(_quantize(frac))
        rate = F.when(cond, lit) if rate is None else rate.when(cond, lit)
    rate = (rate.otherwise(F.lit(_quantize(default_fraction)))
            if rate is not None else F.lit(_quantize(default_fraction)))
    return df.filter(_bucket(key_cols, salt) < rate)


def temperature_mix(df: DataFrame, alpha: float = 0.5,
                    budget_frac: float = 0.5,
                    source_col: str = "source",
                    key_cols: Sequence[str] | str = "doc_id",
                    salt: str = "tempmix") -> DataFrame:
    """Temperature-based source rebalancing (the mT5/data-mixture
    recipe): source ``s`` with ``n_s`` rows is sampled with probability
    proportional to ``n_s**alpha`` — ``alpha < 1`` flattens the mix
    (big crawls downsampled toward small curated sources), ``alpha=1``
    is proportional (no rebalance), ``alpha=0`` is uniform-by-source.
    ``budget_frac`` sets the expected output size as a fraction of the
    input; per-source rates are capped at 1 (no upsampling — emit
    weights or repeat epochs for that).

    Membership is the same deterministic per-row hash as
    :func:`hash_sample`, so reruns and engines agree row-for-row. All
    derived rate arithmetic is sequenced identically to the SQL oracle
    (weights cumulated in source order — cross-engine bit-identical
    left folds; ``alpha=0.5`` uses IEEE ``sqrt``, exact in every
    engine; other alphas go through ``pow``, whose last-ulp rounding
    is libm-specific — fine for production, but pin oracle checks to
    0.5/1.0/0.0).

    Scale: one narrow per-source count (map-side combined), a window
    over the tiny per-source table only, rates broadcast back, and the
    accept test is a scan-pipeline filter — no data-sized shuffle.

    NULL sources form their own sampled group (a sentinel-coalesced
    string key — an equi-join on the raw column would silently drop
    them); with NULLs present, or a non-string source column, mirror
    the cumulation order explicitly in any cross-engine replay (the
    shipped oracle's corpus has non-NULL varchar sources, where raw
    and coalesced order coincide).
    """
    from pyspark.sql import Window

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # NULL sources form their own group: a plain equi-join on the raw
    # column would silently DROP every NULL-source row (NULL never
    # equi-matches), so group and join on a sentinel-coalesced copy
    src = F.coalesce(F.col(source_col).cast("string"),
                     F.lit("\x00__null_source__"))
    work = df.withColumn("__src__", src)
    # r13 (guide §2.4): the per-source count table fans out to three
    # consumers (the __wtot__/__ntot__ totals broadcast, the rates
    # broadcast, and — transitively — the accept join), each planned
    # as its own broadcast subtree, so the corpus was count-scanned
    # three times. The table is one row per source: checkpoint it.
    counts = work.groupBy("__src__").agg(
        F.count(F.lit(1)).alias("__n__")).localCheckpoint(eager=False)
    nd = F.col("__n__").cast("double")
    if alpha == 0.5:
        w = F.sqrt(nd)
    elif alpha == 1.0:
        w = nd
    elif alpha == 0.0:
        w = F.lit(1.0)
    else:
        w = F.pow(nd, F.lit(alpha))
    # sequential cumulation in source order: MAX(cum) is then a
    # deterministic left-fold total, bit-reproducible by the oracle
    # (a bare SUM over doubles has engine-chosen addend order)
    wseq = (Window.orderBy("__src__")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = counts.withColumn("__w__", w) \
        .withColumn("__cw__", F.sum("__w__").over(wseq))
    tot = cum.agg(F.max("__cw__").alias("__wtot__"),
                  F.sum("__n__").alias("__ntot__"))
    rates = cum.crossJoin(F.broadcast(tot)).select(
        F.col("__src__"),
        F.least(
            F.lit(1.0),
            (F.col("__ntot__").cast("double") * F.lit(budget_frac))
            * (F.col("__w__") / F.col("__wtot__")) / nd,
        ).alias("__r__"),
    )
    key = F.concat_ws("|", F.lit(salt),
                      *[F.col(c).cast("string") for c in keys])
    hfrac = (hash60(key) % 1_000_000).cast("double") / F.lit(1_000_000.0)
    return (
        work.join(F.broadcast(rates), "__src__")
        .filter(hfrac < F.col("__r__"))
        .select(*df.columns)
    )


#: hash-prefix buckets for the per-group scalar-cutoff decomposition:
#: hash60 is uniform on [0, 2^60), so ``h >> 50`` yields 1024 buckets
#: whose order AGREES with the h order (all of bucket b sorts before
#: bucket b+1) — the property that lets a per-group running total be
#: split into per-(group, bucket) running totals plus a broadcast
#: prefix offset.
CUTOFF_BUCKETS = 1024
_CUTOFF_SHIFT = 60 - CUTOFF_BUCKETS.bit_length() + 1  # 50


def _hash_and_bucket(key_cols: Sequence[str], salt: str):
    key = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    h = hash60(key)
    return h, F.shiftright(h, _CUTOFF_SHIFT)


def cap_per_group(df: DataFrame, group_col: str,
                  key_cols: Sequence[str] | str, cap: int,
                  salt: str = "cap") -> DataFrame:
    """Quota sampling: keep at most ``cap`` rows per group (per domain,
    per language, per source), chosen deterministically by key hash —
    the standard guard against one domain dominating a training mix.

    Selection order is (hash60(salt|key), key) within the group, so
    membership is stable across runs/engines AND monotone: raising the
    cap only ever ADDS rows (the kept set for cap=k is a prefix of the
    kept set for cap=k+1).

    Scale shape (VERDICT r5 item 1): a plain
    ``row_number() OVER (PARTITION BY group)`` serializes each group
    into ONE task — at 100 TB with a handful of sources that is a
    single executor scanning a whole source. Instead the global
    per-group rank is decomposed:

      1. per-(group, hash-bucket) row counts — a tiny map-combined
         aggregate (≤ |groups| × 1024 rows);
      2. a prefix scan over that tiny table (window over the bucket
         table only) gives each bucket its count of PRECEDING rows;
      3. join the offsets back (AQE broadcasts the tiny table for
         few-group quotas; high-cardinality group columns take a
         plain shuffle join) and rank within (group, bucket) —
         1024-way parallel per group — so the global rank is
         ``offset + within-bucket row_number``.

    Output row set is identical to the single-window formulation
    (bucket order agrees with hash order, see CUTOFF_BUCKETS).
    """
    from pyspark.sql import Window

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h, bkt = _hash_and_bucket(key_cols, salt)
    b = "__cp_bkt__"
    src = df.withColumn(b, bkt)

    # tiny (group, bucket) → preceding-row-count table, broadcast back.
    # The prefix window here runs over ≤ |groups|×1024 rows, not data.
    counts = src.groupBy(group_col, b).agg(F.count(F.lit(1)).alias("__n__"))
    wpre = (Window.partitionBy(group_col).orderBy(b)
            .rowsBetween(Window.unboundedPreceding, -1))
    off = counts.select(
        F.col(group_col).alias("__g__"), F.col(b).alias("__b__"),
        F.coalesce(F.sum("__n__").over(wpre), F.lit(0)).alias("__off__"),
        # buckets whose offset already exceeds the cap can't contribute
        # a kept row — prune them BEFORE the big window shuffle
    ).filter(F.col("__off__") < cap)

    # no broadcast HINT: off is ≤ |groups|×1024 rows — tiny for the
    # few-groups case (AQE broadcasts it at runtime) but a forced
    # broadcast would FAIL for a high-cardinality group column (per-
    # domain quotas over millions of domains); the equi-join shape is
    # correct either way
    joined = src.join(
        off,
        src[group_col].eqNullSafe(F.col("__g__")) & (F.col(b) == F.col("__b__")),
    )
    w = Window.partitionBy(group_col, b).orderBy(h, *[F.col(c) for c in key_cols])
    rn = "__cp_cap_rn__"
    return (
        joined.withColumn(rn, F.row_number().over(w) + F.col("__off__"))
        .filter(F.col(rn) <= cap)
        .select(*df.columns)
    )


def global_order_index(df: DataFrame, key_cols: Sequence[str] | str,
                       salt: str = "shuffle",
                       out_col: str = "pos") -> DataFrame:
    """Deterministic global shuffle order for training: attach each
    row's 0-based position in ``(hash60(salt|key), key)`` order — the
    "shuffle the corpus once, reproducibly" primitive a dataloader
    needs (same key → same position across runs, engines, and
    partitionings; changing ``salt`` yields an independent permutation).

    Scale shape: the naive ``row_number() OVER (ORDER BY h)`` funnels
    ALL data into ONE window task. Instead the rank is decomposed via
    the same order-compatible hash buckets as :func:`cap_per_group`:
    per-bucket counts (tiny map-combined aggregate, ≤1024 rows) →
    prefix scan over that tiny table → broadcast offsets back →
    ``row_number`` within each bucket (1024-way parallel) + offset.
    Output is identical to the single-window formulation because
    bucket order agrees with hash order (see CUTOFF_BUCKETS).

    ``key_cols`` must identify rows uniquely: rows sharing the full
    key sort as exact ties, so their relative positions (like any
    engine's ROW_NUMBER over ties) are arbitrary.
    """
    from pyspark.sql import Window

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h, bkt = _hash_and_bucket(key_cols, salt)
    b = "__cp_bkt__"
    src = df.withColumn(b, bkt)

    counts = src.groupBy(b).agg(F.count(F.lit(1)).alias("__n__"))
    wpre = Window.orderBy(b).rowsBetween(Window.unboundedPreceding, -1)
    off = counts.select(
        F.col(b).alias("__b__"),
        F.coalesce(F.sum("__n__").over(wpre), F.lit(0)).alias("__off__"),
    )
    joined = src.join(off, F.col(b) == F.col("__b__"))
    w = Window.partitionBy(b).orderBy(h, *[F.col(c) for c in key_cols])
    return (
        joined.withColumn(out_col,
                          F.row_number().over(w).cast("long")
                          + F.col("__off__") - 1)
        .select(*df.columns, out_col)
    )


def top_fraction_by_score(df: DataFrame, score_col: str, group_col: str,
                          fraction: float,
                          key_cols: Sequence[str] | str,
                          salt: str = "topfrac") -> DataFrame:
    """Quality-percentile curation: keep the top ``fraction`` of each
    group's rows by ``score_col`` (descending), ties broken by
    ``(hash60(salt|key), key)`` — "keep the best 20% of each language
    by quality score", the selection half of a filtering pipeline.

    Per-group keep count is ``ceil(fraction * n_group)`` (every
    non-empty group keeps ≥1 row for fraction > 0); membership is
    deterministic and monotone in ``fraction``.

    Scale shape: ranking by score within a low-cardinality group is
    the same one-task-per-group trap as :func:`cap_per_group`, so the
    rank is decomposed over order-compatible composite buckets
    ``(score DESC, hash-bucket ASC)``: per-(group, score, bucket)
    counts (map-combined aggregate) → prefix scan over that aggregate
    → broadcast offsets → ``row_number`` within (group, score,
    bucket) + offset. Identical output to the single-window form;
    buckets past the keep count are pruned before the data-scale
    shuffle.

    CONTRACT: ``score_col`` must be discrete-ish — the prefix scan is
    per-group serial over |distinct scores|×1024 rows, tiny for flag
    sums / integer counts / quantized scores but data-sized for a raw
    continuous score. Quantize first (``F.round(score, 3)`` keeps the
    decomposition exact for the quantized ordering); the heuristic
    quality/rarity scores in this package are already coarse.
    """
    from pyspark.sql import Window

    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"top_fraction_by_score: fraction {fraction} not in [0, 1]")
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h, bkt = _hash_and_bucket(key_cols, salt)
    b = "__cp_bkt__"
    s = F.col(score_col)
    src = df.withColumn(b, bkt)

    # r13 (guide §2.4): counts feeds BOTH the keep-target aggregate and
    # the offsets scan, so uncheckpointed the corpus is count-scanned
    # twice over (plus the data join's own pass = 3 total). The table
    # is ≤ |groups|×|scores|×1024 rows (tiny by the operator's
    # discrete-score contract): checkpoint it → 2 corpus passes.
    counts = src.groupBy(group_col, score_col, b).agg(
        F.count(F.lit(1)).alias("__n__")).localCheckpoint(eager=False)
    # per-group keep target: ceil(fraction * n) on exact longs
    tgt = counts.groupBy(group_col).agg(
        F.ceil(F.lit(float(fraction)) * F.sum("__n__")).cast("long").alias("__keep__"))
    wpre = (Window.partitionBy(group_col).orderBy(s.desc(), F.col(b))
            .rowsBetween(Window.unboundedPreceding, -1))
    # null-SAFE group join (same as the data join below): a NULL group
    # is a group like any other — the name join's NULL != NULL would
    # silently drop every row of it, violating the >=1-row contract
    tgt = tgt.select(F.col(group_col).alias("__tg__"), "__keep__")
    off = (
        counts.withColumn("__off__",
                          F.coalesce(F.sum("__n__").over(wpre), F.lit(0)))
        .join(tgt, F.col(group_col).eqNullSafe(F.col("__tg__")))
        .filter(F.col("__off__") < F.col("__keep__"))
        .select(F.col(group_col).alias("__g__"),
                F.col(score_col).alias("__s__"), F.col(b).alias("__b__"),
                "__off__", "__keep__")
    )
    joined = src.join(
        off,
        src[group_col].eqNullSafe(F.col("__g__"))
        & s.eqNullSafe(F.col("__s__")) & (F.col(b) == F.col("__b__")),
    )
    w = (Window.partitionBy(group_col, score_col, b)
         .orderBy(h, *[F.col(c) for c in key_cols]))
    rn = "__cp_tf_rn__"
    return (
        joined.withColumn(rn, F.row_number().over(w) + F.col("__off__"))
        .filter(F.col(rn) <= F.col("__keep__"))
        .select(*df.columns)
    )


def train_val_test_split(df: DataFrame, key_cols: Sequence[str] | str,
                         val_fraction: float = 0.1, test_fraction: float = 0.1,
                         salt: str = "split", out_col: str = "split") -> DataFrame:
    """Attach a deterministic 'train'/'val'/'test' label per row. The
    same key always lands in the same split — no leakage on reruns or
    incremental data."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    b = _bucket(key_cols, salt)
    val_hi = _quantize(val_fraction)
    test_hi = val_hi + _quantize(test_fraction)
    label = (
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(out_col, label)


def token_budget_mix(df: DataFrame, budgets: Mapping[str, int],
                     group_col: str = "source",
                     weight_col: str = "n_tokens",
                     key_cols: Sequence[str] | str = "doc_id",
                     default_budget: int = 0,
                     salt: str = "mix") -> DataFrame:
    """Data-mixture curation: fill each group's token budget with a
    deterministic document prefix — the primitive behind "train on
    30B tokens of web + 5B of code" mixture specs.

    Docs are ordered within each group by (hash60(salt|key), key) —
    the same stable order :func:`cap_per_group` uses, so membership is
    reproducible across runs/engines and monotone: raising a group's
    budget only ever ADDS docs. A doc is kept while the group's
    running token total INCLUDING it stays ≤ budget (prefix rule: the
    first overshooting doc and everything after it is dropped, which
    keeps the kept-set a pure function of the budget — no greedy
    skip-ahead that would make membership depend on later rows).

    Weights must be non-negative (token/char counts are): the running
    total is then monotone, so ``run <= budget`` is a pure prefix.

    Scale shape (VERDICT r5 item 1): like :func:`cap_per_group`, the
    per-group running sum is decomposed so no group ever funnels into
    a single window task: per-(group, hash-bucket) weight sums (tiny
    map-combined aggregate) → prefix scan over that tiny table →
    join the preceding-bucket sums back (AQE-broadcast when small) →
    running sum within (group, bucket) + offset, 1024-way parallel
    per group. Buckets
    whose offset already exceeds the group's budget are pruned before
    the big shuffle. Integer bigint sums → no float-order
    nondeterminism; output row set identical to the single-window
    formulation.
    """
    from pyspark.sql import Window

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h, bkt = _hash_and_bucket(key_cols, salt)
    b = "__cp_bkt__"
    # ENFORCE the non-negative contract (the bucket pruning below is
    # only sound for monotone running sums): a negative weight under
    # the old single-window form could re-admit rows after an
    # overshoot, which the pruned form would silently drop — fail loud
    # instead of diverging silently
    wl0 = F.col(weight_col).cast("long")
    wl = F.when(
        wl0 < 0,
        F.raise_error(F.concat(F.lit("token_budget_mix: negative weight in "
                                     + weight_col + ": "),
                               wl0.cast("string")))
    ).otherwise(wl0)
    src = df.withColumn(b, bkt)

    def budget_of(col: F.Column) -> F.Column:
        out = None
        for value, amt in sorted(budgets.items()):
            lit = F.lit(int(amt))
            out = (F.when(col == value, lit) if out is None
                   else out.when(col == value, lit))
        return (out.otherwise(F.lit(int(default_budget)))
                if out is not None else F.lit(int(default_budget)))

    sums = src.groupBy(group_col, b).agg(F.sum(wl).alias("__s__"))
    wpre = (Window.partitionBy(group_col).orderBy(b)
            .rowsBetween(Window.unboundedPreceding, -1))
    off = sums.select(
        F.col(group_col).alias("__g__"), F.col(b).alias("__b__"),
        F.coalesce(F.sum("__s__").over(wpre), F.lit(0)).alias("__off__"),
    ).filter(
        # a bucket whose preceding-weight offset is already past the
        # budget can still keep zero-weight rows iff offset == budget;
        # only offset > budget buckets are provably empty of keeps
        F.col("__off__") <= budget_of(F.col("__g__"))
    )

    # no broadcast hint — see cap_per_group: forced broadcast breaks
    # the high-cardinality-group case; AQE broadcasts when truly small
    joined = src.join(
        off,
        src[group_col].eqNullSafe(F.col("__g__")) & (F.col(b) == F.col("__b__")),
    )
    w = (Window.partitionBy(group_col, b)
         .orderBy(h, *[F.col(c) for c in key_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = "__cp_mix_run__"
    return (
        # coalesce: a row whose window prefix is all-NULL weights gets
        # a NULL running sum — treat null weights as consuming zero
        # budget (kept while the bucket offset fits) instead of
        # silently dropping rows based on where the hash order put them
        joined.withColumn(run,
                          F.coalesce(F.sum(wl).over(w), F.lit(0))
                          + F.col("__off__"))
        .filter(F.col(run) <= budget_of(F.col(group_col)))
        .select(*df.columns)
    )


def systematic_weighted_sample(df: DataFrame, weight_col: str, n: int,
                               key_cols: Sequence[str] | str,
                               salt: str = "wsample") -> DataFrame:
    """Weighted sampling without replacement by SYSTEMATIC resampling
    (the particle-filter scheme: one stride through the cumulative
    weight axis, a sample point every ``W/n``): row i with weight
    ``w_i`` is kept iff its cumulative-weight interval
    ``[cum_i, cum_i + w_i)`` contains a point ``k·W/n`` — i.e.
    inclusion probability ≈ ``n·w_i/W`` (rows with ``w_i ≥ W/n`` are
    kept with certainty, once). Typical use: token-weighted corpus
    subsampling where long docs should be proportionally likelier.

    Integer-exact BY CONSTRUCTION (NOTES determinism rules): weights
    must be integral (token/char counts); the inclusion test
    ``floor((cum+w)·n/W) > floor(cum·n/W)`` is evaluated in
    DECIMAL(38,0)/HUGEINT arithmetic — verified bit-identical across
    engines — so membership never sits on a float boundary, unlike
    the classic Efraimidis–Spirakis ``u^(1/w)`` keys whose ln/pow
    cross-engine ulps can flip the cutoff. The traversal order is the
    deterministic hash permutation ``(hash60(salt|key), key)`` — the
    randomization u of systematic resampling comes from the hash
    placement, not an RNG.

    Scale shape: the cumulative weight is decomposed exactly like
    :func:`global_order_index` — per-bucket weight sums (≤1024-row
    aggregate) → prefix scan over that tiny table → broadcast back →
    within-bucket running sum (1024-way parallel). Total W is an
    uncorrelated scalar subquery. No data-sized window, no collect.

    NULL weights count 0 (never selected); negative weights raise
    in-plan. Returns ``df``'s columns unchanged, filtered.
    """
    from pyspark.sql import Window

    if n <= 0:
        raise ValueError(f"systematic_weighted_sample: n must be > 0, "
                         f"got {n}")
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h, bkt = _hash_and_bucket(key_cols, salt)
    b = "__cp_bkt__"
    wc = F.when(
        F.col(weight_col) < 0,
        F.raise_error(F.concat(
            F.lit("systematic_weighted_sample: negative weight "),
            F.col(weight_col).cast("string"))),
    ).otherwise(F.coalesce(F.col(weight_col).cast("long"), F.lit(0)))
    src = df.withColumn(b, bkt).withColumn("__cp_w__", wc)

    # r13 (guide §2.4): the bucket-sum table feeds both the prefix
    # offsets and (derived) the grand total — before, the total was a
    # separate scalar subquery that re-scanned the corpus (scalars run
    # outside exchange-reuse scope). The table is ≤n_buckets rows:
    # checkpoint it and sum it for the total (Σ bucket sums == Σ all
    # weights, exact bigints). 3 corpus scans → 2 (sums + the kept
    # filter's own pass).
    sums = src.groupBy(b).agg(F.sum("__cp_w__").alias("__s__")) \
        .localCheckpoint(eager=False)
    wpre = Window.orderBy(b).rowsBetween(Window.unboundedPreceding, -1)
    off = sums.select(
        F.col(b).alias("__b__"),
        F.coalesce(F.sum("__s__").over(wpre), F.lit(0)).alias("__off__"),
    )
    total = sums.groupBy().agg(F.sum("__s__").alias("t")).scalar()
    wrun = (Window.partitionBy(b)
            .orderBy(h, *[F.col(c) for c in key_cols])
            .rowsBetween(Window.unboundedPreceding, -1))
    cum = (F.coalesce(F.sum("__cp_w__").over(wrun), F.lit(0))
           + F.col("__off__")).cast("decimal(38,0)")
    joined = (src.join(off, F.col(b) == F.col("__b__"))
              .withColumn("__cp_cum__", cum)
              .withColumn("__cp_t__", total.cast("decimal(38,0)")))
    # floor((cum+w)·n/W) > floor(cum·n/W), all exact decimal math
    kept = joined.filter(F.expr(
        f"(CAST(__cp_cum__ + __cp_w__ AS DECIMAL(38,0)) * {n}) div __cp_t__"
        f" > (__cp_cum__ * {n}) div __cp_t__"))
    return kept.select(*df.columns)


def leakage_safe_split(docs: DataFrame, clusters: DataFrame,
                       id_col: str = "doc_id", val_fraction: float = 0.1,
                       test_fraction: float = 0.1,
                       salt: str = "split") -> DataFrame:
    """Near-dup-aware train/val/test split: hash the CLUSTER, not the
    document — every member of a near-dup family lands in the same
    split, so evaluation never scores on a near-copy of a training
    doc (the standard leakage failure of per-doc splitting).

    ``clusters`` is ``dup_clusters`` / ``dup_clusters_collapsed``
    output; docs without a near-dup edge are their own singleton
    cluster (left-join coalesce), making this a strict generalization
    of :func:`train_val_test_split` — identical labels when the pair
    graph is empty.

    Shape: one output-sized equi-join + the same stateless hash label;
    nothing corpus-global. Returns (id, cluster_id, split).
    """
    full = (docs.select(F.col(id_col))
            .join(clusters, id_col, "left")
            .withColumn("cluster_id",
                        F.coalesce(F.col("cluster_id"), F.col(id_col))))
    return train_val_test_split(full, "cluster_id", val_fraction,
                                test_fraction, salt)
