"""Local stand-in for the driver's t2 gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + schema + order-insensitive value-hash.

Usage: python tools/check_correctness.py [--json OUT.json] [sf_dir] [query ...]

With --json, also writes a driver-format artifact: one object per
query with rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err (rows-only queries record err="no_oracle" with null
matches, as the driver does).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _hash_rows(cols, rows) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(lines), h


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report: dict[str, dict] = {}

    import __spark_entry__ as e
    from csvplus_spark import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    # bound the oracle, don't trust it: at 10x scale the blocking-free
    # quadratic oracle SQL for the pair queries can eat all RAM (the
    # in-memory DB has no spill path by default — observed 108 GB RSS
    # on the sf1 dedup_ngram oracle). A memory cap + temp dir turns
    # that into disk spill instead of an OOM-kill of the whole sweep.
    tmp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", ".localdata", "duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET memory_limit='"
                + os.environ.get("CSVPLUS_ORACLE_MEM", "48GB") + "'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": f"spark: {ex}"[:200]}
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(srows),
                            "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            failures += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(srows),
                            "oracle_rows": None, "err": f"oracle: {ex}"[:200]}
            continue
        sn, sh = _hash_rows(scols, srows)
        on, oh = _hash_rows(ocols, orows)
        status = "PASS" if (sn, sh) == (on, oh) and sorted(scols) == sorted(ocols) else "FAIL"
        report[name] = {"rows_match": sn == on,
                        "schema_match": sorted(scols) == sorted(ocols),
                        "hash_match": sh == oh, "spark_rows": sn,
                        "oracle_rows": on, "err": None}
        if status == "FAIL":
            failures += 1
            print(f"FAIL  {name}: spark ({sn} rows, {sh}) vs oracle ({on} rows, {oh})"
                  f" cols {sorted(scols)} vs {sorted(ocols)}")
            for i, (a, b) in enumerate(zip(
                sorted("|".join(map(_norm_cell, r)) for r in srows)[:3],
                sorted("|".join(map(_norm_cell, r)) for r in orows)[:3],
            )):
                if a != b:
                    print(f"      first diff sample {i}:\n        spark : {a}\n        oracle: {b}")
                    break
        else:
            print(f"PASS  {name} ({sn} rows, {time.time()-t0:.1f}s)")
    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} entries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
