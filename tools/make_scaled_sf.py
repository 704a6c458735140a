"""Derive a larger scale factor from the driver's own parquet tables
(VERDICT r5 item 3: one real 10× data point to validate the engine's
scale claims instead of extrapolating everything from sf0.1).

Scheme: N key-shifted copies of every scalable table (TPC-H-style
refresh-segment replication) — copy c adds ``c * KEY_OFFSET`` to every
entity key, applied consistently on BOTH sides of each FK (orders and
lineitem shift o_orderkey/l_orderkey identically, etc.), so all joins
land exactly as they do at the base scale. region/nation stay fixed
(dims). Non-key payloads are copied verbatim: documents/embeddings get
exact duplicate content per copy — a realistic crawl-duplication shape
that stress-tests the dedup family with 10-member clusters.

Output layout mirrors the driver's (``<out>/sf<k>/<table>.parquet``),
so tools/check_correctness.py and bench.py run on it unchanged:

    python tools/make_scaled_sf.py [--copies 10] \
        [--src /root/testdata/sf0.1] [--out /root/repo/.localdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

#: added to every entity key per copy; far above any base-scale key
KEY_OFFSET = 10_000_000

#: key columns to shift per table (must cover both sides of every FK)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

FIXED = ["region", "nation"]


def scale(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied (fixed dim)")
    for t, keys in SHIFT.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()]
        sel = ", ".join(
            f'"{c}" + c.c * {KEY_OFFSET} AS "{c}"' if c in keys else f'"{c}"'
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"(SELECT unnest(range({copies})) AS c) c ORDER BY c.c) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, f"x{copies} -> {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.localdata/sf1")
    a = ap.parse_args()
    scale(a.src, a.out, a.copies)
