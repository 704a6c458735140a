"""Oracle output-typing gate (round-10 verdict item 1).

Round 9's one driver-red (`pack_sequences`) was NOT an engine bug: the
oracle's ``SUM(BIGINT) OVER`` returns HUGEINT in DuckDB, so derived
``bf // 512`` columns came back HUGEINT → an Arrow fetch renders them
``Decimal('0')`` → the driver's cell normalization disagrees with
Spark's plain long even though every value is numerically identical.
The local harness fetches via ``fetchall()`` (Python ints) and so
never saw it.

This gate closes the class: ``DESCRIBE`` every ``oracle_sql()`` entry
against DuckDB (cheap — no execution) and assert no output column is
HUGEINT or DECIMAL.

Round 10 widened the class: the driver canonicalizer sorts the result
frame by EVERY output column (``pandas.sort_values``), which cannot
factorize list/struct/map cells — so a nested-typed OUTPUT column is a
guaranteed driver ``err`` even when values hash-match locally
(round 10's one red, ``mean_pool``, carried ``pooled
array<double>``). Nested types are fine INSIDE a query; gate queries
must explode them to scalar rows (house shape:
``normalize_embeddings`` → ``(vec_id, pos, val)``). This gate
therefore also bans LIST/STRUCT/MAP/ARRAY-typed oracle outputs.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

BANNED = ("HUGEINT", "DECIMAL", "UHUGEINT")
# Nested types break the driver's sort_values canonicalization
# (round-10 verdict item 1): DuckDB DESCRIBE renders lists as
# "T[]", structs as "STRUCT(...)", maps as "MAP(...)".
BANNED_NESTED = ("[]", "STRUCT", "MAP(", "LIST", "ARRAY")


def _oracles():
    import __spark_entry__ as e

    return e.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_no_hugeint_or_decimal_oracle_outputs(con):
    """DESCRIBE every oracle; collect all offenders so one run shows
    the full list rather than failing one at a time."""
    offenders = []
    for name, sql in sorted(_oracles().items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # noqa: BLE001 - report, don't mask
            offenders.append((name, "<describe failed>", str(exc)[:200]))
            continue
        for col, typ, *_ in desc:
            up = typ.upper()
            if any(b in up for b in BANNED):
                offenders.append((name, col, typ))
            elif any(b in up for b in BANNED_NESTED):
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracle output columns with driver-hash-unsafe types "
        "(numeric: wrap in CAST(... AS BIGINT/DOUBLE); nested "
        "list/struct/map: explode to scalar rows like "
        "normalize_embeddings): "
        + "; ".join(f"{n}.{c}: {t}" for n, c, t in offenders))


def test_arrow_vs_fetchall_parity_on_sample(con):
    """The exact driver-vs-local gap round 9 exposed: fetch one row of
    each oracle BOTH ways (fetchall → Python scalars; Arrow batch →
    driver-style) and assert the normalized cell renderings agree.
    Executing 170 oracles is too slow for a unit gate, so sample the
    windowed/aggregating oracles most at risk plus the round-9 culprit.
    """
    import decimal

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, float):
            return repr(round(v, 9))
        if isinstance(v, decimal.Decimal):
            return repr(round(float(v), 9))
        return str(v)

    sample = ["pack_sequences", "window_running", "token_budget_mix",
              "chunk_docs", "agg_pricing_summary",
              # the r10 red, reshaped to scalar rows in r11
              "mean_pool", "multimodal_grid"]
    oracles = _oracles()
    for name in sample:
        sql = oracles.get(name)
        if sql is None:
            continue
        one = f"SELECT * FROM ({sql}) ORDER BY ALL LIMIT 1"
        rows = con.execute(one).fetchall()
        if not rows:
            continue
        tbl = con.execute(one).arrow()
        arrow_row = [c[0].as_py() for c in tbl.columns]
        plain_row = list(rows[0])
        got = [norm(v) for v in arrow_row]
        want = [norm(v) for v in plain_row]
        assert got == want, (
            f"{name}: Arrow fetch renders row 0 as {got} but fetchall "
            f"renders {want} — a driver-side hash mismatch waiting to "
            f"happen")
