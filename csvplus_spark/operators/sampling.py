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


def cap_per_group(df: DataFrame, group_col: str,
                  key_cols: Sequence[str] | str, cap: int,
                  salt: str = "cap") -> DataFrame:
    """Quota sampling: keep at most ``cap`` rows per group (per domain,
    per language, per source), chosen deterministically by key hash —
    the standard guard against one domain dominating a training mix.

    Selection order is (hash60(salt|key), key) within the group, so
    membership is stable across runs/engines AND monotone: raising the
    cap only ever ADDS rows (the kept set for cap=k is a prefix of the
    kept set for cap=k+1). One window per group — a single shuffle
    keyed by the group column.
    """
    from pyspark.sql import Window

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    key = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    h = hash60(key)
    w = Window.partitionBy(group_col).orderBy(h, *[F.col(c) for c in key_cols])
    rn = "__cp_cap_rn__"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= cap)
        .drop(rn)
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

    Scale: integer weights, one window shuffle keyed by ``group_col``
    (per-group partitions, parallel across groups); running sum of
    bigints → no float-order nondeterminism.
    """
    from pyspark.sql import Window

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    key = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    w = (Window.partitionBy(group_col)
         .orderBy(hash60(key), *[F.col(c) for c in key_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    budget = None
    for value, b in sorted(budgets.items()):
        cond = F.col(group_col) == value
        lit = F.lit(int(b))
        budget = F.when(cond, lit) if budget is None else budget.when(cond, lit)
    budget = (budget.otherwise(F.lit(int(default_budget)))
              if budget is not None else F.lit(int(default_budget)))
    run = "__cp_mix_run__"
    return (
        df.withColumn(run, F.sum(F.col(weight_col).cast("long")).over(w))
        .filter(F.col(run) <= budget)
        .drop(run)
    )
