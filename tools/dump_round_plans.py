"""Dump `.explain("formatted")` for named queries to per-query text
files — the before/after plan evidence an optimization round commits
under plans/<round>/.

Usage:
    python tools/dump_round_plans.py OUTDIR TAG QUERY [QUERY...] [--sf DIR]

Writes OUTDIR/<query>_<TAG>.txt for each query. TAG is normally
"before" or "after". Plans are built lazily (no job runs), so this is
cheap and safe to run alongside other work; with AQE on the dump is
the initial plan (isFinalPlan=false), which is what the plan-shape
claims (Exchange count, join strategy, PushedFilters, Python eval
nodes) are checked against.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    if len(args) < 3:
        print(__doc__)
        sys.exit(2)
    outdir, tag, names = args[0], args[1], args[2:]

    import __spark_entry__ as e
    from csvplus_spark import get_spark

    spark = get_spark("plan-dump-round")
    qs = e.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not a declared query")
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted'), tag={tag}, "
                    f"data={sf_dir}\n\n")
            f.write(buf.getvalue().strip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
