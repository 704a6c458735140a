"""Driver-verification rotation bookkeeping (r7 verdict item 1).

The round driver hash-checks only the FIRST 50 entries of
``queries()``; this tool walks every committed CORRECTNESS_r*.json,
unions the queries that have ever earned a driver-green row, and
prints the remaining backlog — the pool the next round's rotation
slots should draw from (see the rotation block in
``__spark_entry__.py::queries``).

Usage: python tools/rotation_status.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def driver_green() -> dict[str, list[str]]:
    """query -> rounds in which the driver verified it green."""
    green: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        try:
            sheet = json.load(open(path))
        except Exception:
            continue
        for name, row in sheet.items():
            ok = (row.get("rows_match") and row.get("schema_match")
                  and (row.get("hash_match") or row.get("err") == "no_oracle"))
            if ok:
                green.setdefault(name, []).append(rnd)
    return green


def _round_no(tag: str) -> int:
    """Numeric round of an 'rNN' tag — lexicographic max would
    misorder the first unpadded or 3-digit tag ('r9' > 'r10',
    'r100' < 'r99'), silently rotating the wrong queries
    (r13 review)."""
    digits = "".join(c for c in tag if c.isdigit())
    return int(digits) if digits else -1


def staleness() -> list[tuple[str, str]]:
    """(query, newest_green_round) sorted stalest-first (r12 verdict
    item 5: with the never-verified backlog at zero, rotation slots
    refresh the queries whose newest driver-green row is OLDEST)."""
    latest: dict[str, str] = {}
    for name, rounds in driver_green().items():
        latest[name] = max(rounds, key=_round_no)
    return sorted(latest.items(), key=lambda kv: (_round_no(kv[1]), kv[0]))


def latest_local_sweep() -> tuple[str, dict] | None:
    """Newest committed artifacts/CORRECTNESS_LOCAL_r*.json, or None."""
    paths = sorted(glob.glob(
        os.path.join(ROOT, "artifacts", "CORRECTNESS_LOCAL_r*.json")))
    paths = [p for p in paths if not p.endswith("_pre.json")]
    if not paths:
        return None
    try:
        return paths[-1], json.load(open(paths[-1]))
    except Exception:
        return None


def rotated_out_regressions() -> list[str]:
    """Every query that EVER earned a driver-green row must stay
    hash-green in the newest local full sweep (ADVICE r8: rotation
    must not turn past driver coverage into advisory-only coverage).
    Returns the regressed names; queries absent from the sweep
    artifact (added after it was generated) are skipped, not failed —
    they have no baseline yet."""
    latest = latest_local_sweep()
    if latest is None:
        return []
    _path, sweep = latest
    bad = []
    for name in driver_green():
        row = sweep.get(name)
        if row is None:
            continue
        ok = (row.get("rows_match") and row.get("schema_match")
              and (row.get("hash_match") or row.get("err") == "no_oracle"))
        if not ok:
            bad.append(name)
    return sorted(bad)


def main() -> int:
    import __spark_entry__ as em

    qs = list(em.queries())
    green = driver_green()
    verified = [q for q in qs if q in green]
    backlog = [q for q in qs if q not in green]
    window = qs[:50]
    first_time = [q for q in window if q not in green]
    print(f"declared queries: {len(qs)}")
    print(f"ever driver-green: {len(verified)}")
    print(f"backlog (never driver-verified): {len(backlog)}")
    print(f"current window: {len(window)} entries, "
          f"{len(first_time)} would earn a first-time row:")
    for q in first_time:
        print(f"  + {q}")
    nxt = [q for q in backlog if q not in window]
    print(f"next rotation pool ({len(nxt)}):")
    for q in nxt:
        print(f"  - {q}")
    bad = rotated_out_regressions()
    if bad:
        print(f"REGRESSED (driver-green before, local sweep now red): "
              f"{bad}")
        return 1
    print("rotated-out coverage: all previously driver-green queries "
          "stay green in the latest local sweep")
    return 0


if __name__ == "__main__":
    sys.exit(main())
