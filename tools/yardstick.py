#!/usr/bin/env python3
"""Same-day DuckDB yardstick: time every oracle SQL from a Verify dump
against the same parquet tables, for pairing with a Spark bench run on
the same box in the same throughput window. Dev tooling only.

Usage: python3 tools/yardstick.py [sfdir] [oracle_sql.json] [threads]
Prints one JSON line {"total": sec, "queries": {name: sec}}.
"""
import json, sys, time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLES = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
THREADS = int(sys.argv[3]) if len(sys.argv) > 3 else 32

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import duckdb
    con = duckdb.connect()
    con.execute(f"SET threads TO {THREADS}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF}/{t}.parquet')")
    with open(ORACLES) as f:
        sqls = json.load(f)
    times = {}
    # warm-up pass (parquet metadata/OS page cache), then min-of-2 timed
    # passes — mirrors graft.Bench's measurement hygiene.
    for name in sorted(sqls):
        con.execute(sqls[name]).fetchall()
    for _ in range(2):
        for name in sorted(sqls):
            t0 = time.monotonic()
            con.execute(sqls[name]).fetchall()
            dt = time.monotonic() - t0
            times[name] = min(times.get(name, float("inf")), dt)
    print(json.dumps({"total": sum(times.values()), "threads": THREADS,
                      "sf": SF, "queries": times}))


main()
