"""Column-sampled sf10 hash verification (r11 verdict item 4).

The r11 sf10 sweep excluded the wide-projection queries (map_derive,
join_prefix, ... at 60M output rows) ONLY because the local Python
row-hash in tools/check_correctness.py cannot chew 60M wide rows —
the engine plans and the oracle SQL are both linear. This closes the
gap with a DETERMINISTIC ROW SAMPLE applied identically to both
sides: keep rows whose key's md5 hex digest ends in '0' (a 1/16
sample; md5 of the same text is identical in Spark and DuckDB, and
integer/string keys render identically as VARCHAR in both engines).
The full result is still computed by both engines — only the
comparison is sampled — so a wrong value anywhere in the sampled key
space still breaks the hash.

Queries in DIRECT have small outputs and just never earned an sf10
row; they run through the plain full-hash gate.

Usage:
    python tools/check_scaled_sampled.py [--json OUT.json] [sf_dir] [query ...]

Defaults to .localdata/sf10 (tools/make_scaled_sf.py output).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from check_correctness import TABLES, _hash_rows

#: query -> sample key column (must be present in the OUTPUT of both
#: the Spark query and the oracle SQL, non-null, and rendered
#: identically as text by both engines: integers or plain strings)
SAMPLED = {
    "map_derive": "l_orderkey",
    "join_prefix": "o_orderkey",
    "resolve_dups_first": "l_orderkey",
    "linear_scorer": "doc_id",
    "normalize_embeddings": "vec_id",
    "rand_proj": "vec_id",
    "quantize_embeddings": "vec_id",
    "remove_spans": "doc_id",
    "repeated_spans": "doc_id",
}

#: small-output queries with no sf10 row yet — full hash, no sampling
DIRECT = ["agg_distinct", "avro_ingest", "avro_snappy_ingest",
          "skew_salted_join"]


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = args[0] if args else os.path.join(root, ".localdata", "sf10")
    only = set(args[1:])

    import __spark_entry__ as e
    from csvplus_spark import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("sf10-sampled-check")
    con = duckdb.connect()
    tmp = os.path.join(root, ".localdata", "duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET memory_limit='"
                + os.environ.get("CSVPLUS_ORACLE_MEM", "64GB") + "'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e._all_queries(), e.oracle_sql()
    report: dict[str, dict] = {}
    failures = 0
    for name in list(SAMPLED) + DIRECT:
        if only and name not in only:
            continue
        key = SAMPLED.get(name)
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            if key:
                sdf = sdf.filter(F.substring(
                    F.md5(F.col(key).cast("string")), 32, 1) == "0")
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "sampled_on": key,
                            "err": f"spark: {ex}"[:200]}
            continue
        sql = oracles[name]
        if key:
            sql = (f"SELECT * FROM (\n{sql}\n) __s WHERE "
                   f"substr(md5(CAST({key} AS VARCHAR)), 32, 1) = '0'")
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            failures += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(srows),
                            "oracle_rows": None, "sampled_on": key,
                            "err": f"oracle: {ex}"[:200]}
            continue
        sn, sh = _hash_rows(scols, srows)
        on, oh = _hash_rows(ocols, orows)
        ok = (sn, sh) == (on, oh) and sorted(scols) == sorted(ocols)
        report[name] = {"rows_match": sn == on,
                        "schema_match": sorted(scols) == sorted(ocols),
                        "hash_match": sh == oh, "spark_rows": sn,
                        "oracle_rows": on, "sampled_on": key, "err": None}
        tag = f"1/16 sample on {key}" if key else "full"
        if ok:
            print(f"PASS  {name} ({sn} rows, {tag}, {time.time()-t0:.1f}s)")
        else:
            failures += 1
            print(f"FAIL  {name}: spark ({sn}, {sh}) vs oracle ({on}, {oh})")
    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} entries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
