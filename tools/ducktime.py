#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over a testdata dir.

Usage: python3 tools/ducktime.py <sfDir> <oracleSqlJson> [reps]

Prints one JSON object {query: min_seconds} to stdout, sorted by time
descending on stderr for eyeballing. Used to (re)derive the
"substantial subset" list in Bench.scala — queries whose DuckDB oracle
needs > 0.5 s at sf0.1 — so the bench artifact can report the
engine-quality sum separately from the per-job-floor-dominated tail.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                print(f"ERR {name}: {e}", file=sys.stderr)
                best = None
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            times[name] = round(best, 4)
    # Snapshot metadata: the rep count, so Bench can check the
    # min-of-N symmetry invariant (baseline reps >= BaselineDraws)
    # from the artifact instead of trusting an unrecorded CLI arg.
    # Bench's DuckTimes parser filters "__"-prefixed keys out of the
    # comparable board.
    times["__reps__"] = reps
    print(json.dumps(times, indent=0, sort_keys=True))
    for n, t in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{t:8.3f}  {n}", file=sys.stderr)


if __name__ == "__main__":
    main()
