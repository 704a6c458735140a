"""Column profiling — the ANALYZE-style pass a pipeline runs before
choosing dedup keys, join keys, or partition columns.

No reference counterpart (the reference exposes no stats surface);
pure extension. Deterministic by construction: counts only, no float
aggregation, so the DuckDB oracle matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct) for every column, in ONE
    aggregate job.

    The multi-`count_distinct` aggregate becomes a single Expand +
    two-phase hash aggregate in Spark (rows × #columns intermediate —
    the standard profile cost, still one shuffle); the one output row
    is then exploded into a row per column. ``n_distinct`` ignores
    NULLs, matching SQL ``COUNT(DISTINCT col)``.
    """
    aggs = [F.count(F.lit(1)).alias("__cp_rows__")]
    for i, c in enumerate(df.columns):
        aggs.append(
            F.sum(F.when(df[c].isNull(), 1).otherwise(0)).alias(f"__cp_nn_{i}__"))
        aggs.append(F.count_distinct(df[c]).alias(f"__cp_nd_{i}__"))
    one = df.agg(*aggs)
    per_col = F.explode(F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__cp_nn_{i}__").cast("long").alias("n_nulls"),
            F.col(f"__cp_nd_{i}__").cast("long").alias("n_distinct"),
        )
        for i, c in enumerate(df.columns)
    ])).alias("p")
    return one.select(F.col("__cp_rows__").alias("n_rows"), per_col).select(
        F.col("p.col_name").alias("col_name"),
        "n_rows",
        F.col("p.n_nulls").alias("n_nulls"),
        F.col("p.n_distinct").alias("n_distinct"),
    )


def check_expectations(df: DataFrame, rules: dict) -> DataFrame:
    """Column-level data-quality gate: evaluate declarative
    expectations in ONE aggregate job and return a violations report —
    (col_name, rule, n_violations, passed), one row per (column, rule).

    ``rules`` maps column name → dict of expectations:
      * ``not_null``: True — no NULLs
      * ``min`` / ``max``: inclusive value bounds (NULLs don't violate
        bounds — pair with not_null to forbid them)
      * ``allowed``: list of permitted values (NULL not counted)
      * ``regex``: full-match pattern for string columns
      * ``unique``: True — no duplicated non-NULL values

    The row-level sibling of the reference's Validate (csvplus.go:
    300-310, which fails on the FIRST bad row): this reports EVERY
    violation count, the shape a pipeline health dashboard wants.

    Scale: all rules compile into one map-combined aggregate (the
    uniqueness rule adds a count_distinct → the same Expand shape as
    profile_columns); counts are integers, so the report is
    cross-engine exact. Unknown columns or rule names raise
    immediately — a silently skipped expectation is a fake green.
    """
    aggs = []
    specs = []  # (col, rule, agg_alias_builder)
    for col, cr in rules.items():
        if col not in df.columns:
            raise ValueError(f"check_expectations: unknown column {col!r}")
        for rule, arg in cr.items():
            i = len(specs)
            a = f"__ex_{i}__"
            if rule == "not_null":
                aggs.append(F.sum(
                    F.when(df[col].isNull(), 1).otherwise(0)).alias(a))
            elif rule == "min":
                aggs.append(F.sum(
                    F.when(df[col] < F.lit(arg), 1).otherwise(0)).alias(a))
            elif rule == "max":
                aggs.append(F.sum(
                    F.when(df[col] > F.lit(arg), 1).otherwise(0)).alias(a))
            elif rule == "allowed":
                aggs.append(F.sum(
                    F.when(df[col].isNotNull() & ~df[col].isin(list(arg)), 1)
                    .otherwise(0)).alias(a))
            elif rule == "regex":
                aggs.append(F.sum(
                    F.when(df[col].isNotNull()
                           & ~df[col].rlike(f"^(?:{arg})$"), 1)
                    .otherwise(0)).alias(a))
            elif rule == "unique":
                # violations = non-null rows beyond one per distinct value
                aggs.append((F.count(df[col]) - F.count_distinct(df[col]))
                            .alias(a))
            else:
                raise ValueError(
                    f"check_expectations: unknown rule {rule!r} for {col!r}")
            specs.append((col, rule, a))
    if not specs:
        raise ValueError("check_expectations: no rules given")
    one = df.agg(*aggs)
    per_rule = F.explode(F.array(*[
        F.struct(
            F.lit(col).alias("col_name"),
            F.lit(rule).alias("rule"),
            F.coalesce(F.col(a), F.lit(0)).cast("long").alias("n_violations"),
        )
        for col, rule, a in specs
    ])).alias("e")
    return one.select(per_rule).select(
        F.col("e.col_name").alias("col_name"),
        F.col("e.rule").alias("rule"),
        F.col("e.n_violations").alias("n_violations"),
        (F.col("e.n_violations") == 0).alias("passed"),
    )


def key_skew_report(df: DataFrame, key_cols, top_n: int = 20) -> DataFrame:
    """Join/groupBy-key skew diagnostics — the measure-first companion
    to ``operators.skew.salted_join``: the ``top_n`` heaviest key
    values with row count, share of all rows, and skew factor
    (count ÷ mean count per distinct key; 1.0 = perfectly uniform).
    A key with skew ≫ #partitions is the straggler that needs salting
    or AQE skew-join handling.

    Scale: one map-combined count aggregate keyed by the key, one
    single-row global aggregate broadcast back, and a ``top_n``
    TakeOrdered — no window over the data, no driver state.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total__"),
        F.count(F.lit(1)).alias("__nkeys__"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n",
            (F.col("n") / F.col("__total__")).alias("share"),
            (F.col("n") * F.col("__nkeys__") / F.col("__total__"))
            .alias("skew"),
        )
        .orderBy(F.col("n").desc(), *key_cols)
        .limit(top_n)
    )


def embedding_drift(left: DataFrame, right: DataFrame,
                    vec_col: str = "embedding",
                    ndigits: int = 6) -> DataFrame:
    """Per-dimension distribution drift between two embedding corpora
    (old snapshot vs new crawl, reference vs candidate encoder): for
    every dimension, both sides' mean and variance plus the absolute
    mean shift in pooled-std units (a per-dim two-sample z-ish
    effect size) — the production monitor for "did the embedding
    space move".

    Integer-exact BY CONSTRUCTION: components are quantized to
    floor(x·2^20) bigints; Σq and Σq² are exact integer sums (order-
    independent, engine-identical — a float variance would differ per
    partitioning), and the float math happens once per (side, dim) on
    the aggregated integers. Var uses the biased (population) form
    E[q²]−E[q]² in quantized units, ≥0 by construction. Output is one
    row per dimension: (dim, mean_l, mean_r, var_l, var_r, shift).

    Scale: one posexplode + one (dim)-keyed map-combined aggregate
    per side — d·n rows into d-row outputs, broadcast-joined. No
    driver collect, no windows.
    """
    Q = 1048576.0

    def side(df: DataFrame, tag: str) -> DataFrame:
        ex = df.select(
            F.posexplode(F.transform(F.col(vec_col),
                                     lambda x: x.cast("double")))
            .alias("dim", "x"))
        q = ex.withColumn("__q__",
                          F.floor(F.col("x") * F.lit(Q)).cast("long"))
        return (q.groupBy("dim")
                .agg(F.sum("__q__").alias(f"__s_{tag}__"),
                     F.sum(F.col("__q__") * F.col("__q__"))
                     .alias(f"__ss_{tag}__"),
                     F.count(F.lit(1)).alias(f"__n_{tag}__")))

    l, r = side(left, "l"), side(right, "r")

    def mean(tag):
        return (F.col(f"__s_{tag}__").cast("double")
                / F.col(f"__n_{tag}__") / F.lit(Q))

    def var(tag):
        m = F.col(f"__s_{tag}__").cast("double") / F.col(f"__n_{tag}__")
        return ((F.col(f"__ss_{tag}__").cast("double")
                 / F.col(f"__n_{tag}__") - m * m) / F.lit(Q) / F.lit(Q))

    pooled = F.sqrt((var("l") + var("r")) / F.lit(2.0))
    shift = F.when(pooled > 0,
                   F.abs(mean("l") - mean("r")) / pooled) \
        .otherwise(F.lit(0.0))
    return (l.join(r, "dim")
            .select("dim",
                    F.round(mean("l"), ndigits).alias("mean_l"),
                    F.round(mean("r"), ndigits).alias("mean_r"),
                    F.round(var("l"), ndigits).alias("var_l"),
                    F.round(var("r"), ndigits).alias("var_r"),
                    F.round(shift, ndigits).alias("shift"))
            .orderBy("dim"))


def mad_outliers(df: DataFrame, value_col: str, group_col: str,
                 k: float = 3.0, id_cols: list[str] | None = None) -> DataFrame:
    """Robust per-group outlier flags via median absolute deviation:
    flag rows with |value − median| > k·MAD — the monitoring-grade
    alternative to mean/stddev z-scores (one corrupted batch can't
    drag the threshold, since median and MAD have 50% breakdown).

    Determinism: the value is QUANTIZED to a bigint (floor(x·2^20))
    before both medians, so the exact-percentile interpolation
    (lo + (hi−lo)·frac) runs on integers and lands on identical
    doubles in Spark and DuckDB; comparisons are then exact.

    Shape: two group aggregates (median, then MAD of the residuals)
    over the same partition key, the ≤|groups|-row threshold table
    broadcasts back — no per-row window, no global sort. MAD = 0
    (constant group) flags only exact deviators when k·0 = 0.
    """
    q = F.floor(F.col(value_col) * F.lit(1048576.0)).cast("long")
    base = df.withColumn("__q__", q)
    med = (base.groupBy(group_col)
           .agg(F.expr("percentile(__q__, 0.5D)").alias("__med__")))
    resid = (base.join(F.broadcast(med), group_col)
             .withColumn("__ad__",
                         F.floor(F.abs(F.col("__q__") - F.col("__med__")))
                         .cast("long")))
    mad = (resid.groupBy(group_col)
           .agg(F.expr("percentile(__ad__, 0.5D)").alias("__mad__")))
    keep = id_cols if id_cols is not None else [
        c for c in df.columns if c not in (value_col, group_col)]
    return (resid.join(F.broadcast(mad), group_col)
            .select(group_col, *keep, F.col(value_col),
                    (F.col("__ad__").cast("double")
                     > F.lit(k) * F.col("__mad__")).alias("is_outlier")))
