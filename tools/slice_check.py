#!/usr/bin/env python3
"""Engine-independent large-SF evidence for the iterative graph trio
(q_llm_dedup_cc / q_graph_pagerank_conv / q_llm_keeper) and, since r13,
q_graph_triangles (per-node triangle counts, expanded formulation).

The sf3 gate substitutes class-contracted DuckDB oracles that restate
the contraction identities the engine itself implements — tractable,
but not independent exactly where it is being trusted (VERDICT r11
#1). This tool closes that gap with a sampled vertex-induced
subgraph:

  1. pick a sample of clusters from the ENGINE's own cc output (any
     union-of-clusters slice works — see step 2 for why this is not
     circular) and materialize its doc ids as `slice_docs(sid)`;
  2. CLOSURE guard: prove from the raw data (distinct-fingerprint
     pairs, hamming <= 3 — a pure function of the edge predicate)
     that NO expanded edge crosses the slice boundary. A
     closure-passing slice is a union of TRUE components regardless
     of how it was picked: an engine that split a true component
     fails here;
  3. compute the global participant count n the same data-level way
     and materialize it as `global_n(n)` (PageRank's only global
     coupling);
  4. run the PRIMARY (fully expanded: |slice|^2 edge enumeration,
     recursive-CTE reachability, 12 chained rank CTEs, the keeper
     argmax) oracle formulations restricted to the slice, and compare
     EXACTLY against the engine's rows for those docs/clusters. An
     engine that merged components, mislabeled, miscounted, or got
     any r6-discretized rank wrong fails here.

The slice oracles are authored in Scala next to the primaries
(LlmPipe.sliceOracles, dumped by graft.Verify as
oracle_sql_slice.json) so ScaleOracleSpec can pin their structure.

Usage:
  python3 tools/slice_check.py SFDIR OUTDIR [--skip-verify]
      [--clusters N] [--offset K] [--artifact PATH]

OUTDIR must contain (or --skip-verify must be dropped so Verify
produces) the trio's engine dumps at SFDIR. Writes a JSON artifact
(default SLICE_CHECK.json in the repo root) recording the sample, the
guards, and the per-query outcome.
"""
import json, math, os, subprocess, sys

TRIO = ["q_llm_dedup_cc", "q_graph_pagerank_conv", "q_llm_keeper",
        "q_graph_triangles"]

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf3"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/slice_out"
ARGS = sys.argv[3:]
def opt(name, default):
    return int(ARGS[ARGS.index(name) + 1]) if name in ARGS else default
N_CLUSTERS = opt("--clusters", 20)
OFFSET = opt("--offset", 0)
ARTIFACT = (ARGS[ARGS.index("--artifact") + 1] if "--artifact" in ARGS
            else os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "SLICE_CHECK.json"))

ADD_OPENS = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
          "sun.security.action", "sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]


def run_verify():
    cp = "target/scala-2.13/classes:/opt/spark/jars/*"
    cmd = (["java", "-cp", cp] + ADD_OPENS +
           ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-Xmx8g", "graft.Verify", SF, OUT] + TRIO)
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stderr[-4000:])
        sys.exit(1)


def canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(canon(x) for x in v)
    return v


def compare(name, oracle_df, engine_df):
    sc, oc = sorted(engine_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        print(f"  {name}: COLUMN MISMATCH engine={sc} oracle={oc}")
        return False
    engine_df, oracle_df = engine_df[sc], oracle_df[sc]
    if len(engine_df) != len(oracle_df):
        print(f"  {name}: ROWCOUNT engine={len(engine_df)} "
              f"oracle={len(oracle_df)}")
        return False
    ev, ov = engine_df.values.tolist(), oracle_df.values.tolist()
    for i, (a, b) in enumerate(zip(ev, ov)):
        ca, cb = [canon(x) for x in a], [canon(x) for x in b]
        if ca != cb:
            print(f"  {name}: ROW {i} differs\n    engine: {ca}\n"
                  f"    oracle: {cb}")
            return False
    print(f"  {name}: OK ({len(engine_df)} rows, expanded primary "
          "formulation on the slice)")
    return True


def main():
    if "--skip-verify" not in ARGS:
        print(f"[slice] engine dump: trio at {SF} -> {OUT}")
        run_verify()
    import duckdb
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"parquet_scan('{SF}/documents.parquet')")
    with open(f"{OUT}/oracle_sql_slice.json") as f:
        sqls = json.load(f)

    # --- sample clusters from the engine's cc dump (evenly spread
    # over the sorted cluster ids; deterministic given N/OFFSET)
    cc = con.execute("SELECT * FROM parquet_scan("
                     f"'{OUT}/q_llm_dedup_cc/*.parquet')").df()
    clusters = sorted(cc["cluster"].unique().tolist())
    stride = max(1, len(clusters) // N_CLUSTERS)
    sampled = clusters[OFFSET::stride][:N_CLUSTERS]
    slice_ids = sorted(cc[cc["cluster"].isin(sampled)]["doc_id"].tolist())
    print(f"[slice] {len(clusters)} engine clusters; sampled "
          f"{len(sampled)} (stride {stride}, offset {OFFSET}) -> "
          f"{len(slice_ids)} docs")
    # --- negative self-test of the closure guard (the guard is the
    # independence argument's load-bearing piece, so prove it can
    # FAIL): any proper nonempty subset of a connected cluster must
    # trip it — connectivity guarantees an expanded edge from the
    # subset to its complement, hence a crossing distinct-fp pair
    # (equal-fp split or hamming<=3 neighbour). Run a half-cluster
    # slice through the same SQL and require crossing > 0.
    if not sampled:
        print(f"[slice] FAIL: offset {OFFSET} / stride {stride} sampled "
              "zero clusters — lower --offset or --clusters")
        sys.exit(1)
    big = max(sampled, key=lambda c: (cc["cluster"] == c).sum())
    members = sorted(cc[cc["cluster"] == big]["doc_id"].tolist())
    half = members[:max(1, len(members) // 2)]
    if len(half) >= len(members):
        print(f"[slice] FAIL: self-test needs a splittable cluster but the "
              f"largest sampled cluster ({big}) has {len(members)} member — "
              "re-run with a different --offset")
        sys.exit(1)
    con.execute("CREATE TABLE slice_docs (sid BIGINT)")
    con.executemany("INSERT INTO slice_docs VALUES (?)",
                    [(i,) for i in half])
    neg = con.execute(sqls["__closure"]).fetchone()[0]
    if neg == 0:
        print(f"  __closure self-test: FAIL — a half-cluster slice "
              f"({len(half)}/{len(members)} docs of cluster {big}) was "
              "not flagged; the guard cannot detect split components")
        sys.exit(1)
    print(f"  __closure self-test: OK (half of cluster {big} trips the "
          f"guard with {neg} crossing fp pairs)")
    con.execute("DROP TABLE slice_docs")

    con.execute("CREATE TABLE slice_docs (sid BIGINT)")
    con.executemany("INSERT INTO slice_docs VALUES (?)",
                    [(i,) for i in slice_ids])

    # --- closure guard: slice must be a union of TRUE components
    crossing = con.execute(sqls["__closure"]).fetchone()[0]
    if crossing != 0:
        print(f"  __closure: FAIL — {crossing} distinct-fp pairs cross "
              "the slice boundary (engine split a true component, or "
              "the sample is not a union of engine clusters)")
        sys.exit(1)
    print("  __closure: OK (0 crossing edges — slice is a union of "
          "true components)")

    # --- global participant count (PageRank's 0.15/n term)
    n_nodes = con.execute(sqls["__n_nodes"]).fetchone()[0]
    con.execute(f"CREATE TABLE global_n AS SELECT {n_nodes}::BIGINT AS n")
    print(f"  __n_nodes: {n_nodes}")

    results = {}
    fails = []
    for name in TRIO:
        eng = con.execute("SELECT * FROM parquet_scan("
                          f"'{OUT}/{name}/*.parquet')").df()
        if name == "q_llm_keeper":
            eng = eng[eng["cluster"].isin(sampled)]
        else:
            eng = eng[eng["doc_id"].isin(slice_ids)]
        eng = eng.reset_index(drop=True)
        ora = con.execute(sqls[name]).df()
        ok = compare(name, ora, eng)
        results[name] = {"rows": len(eng), "match": ok}
        if not ok:
            fails.append(name)

    with open(ARTIFACT, "w") as f:
        json.dump({"sf": SF, "n_engine_clusters": len(clusters),
                   "sampled_clusters": len(sampled),
                   "slice_docs": len(slice_ids), "closure_crossing": 0,
                   "closure_selftest_crossing": neg,
                   "n_nodes": n_nodes, "stride": stride, "offset": OFFSET,
                   "results": results}, f, indent=1)
    print(f"\n{len(TRIO) - len(fails)}/{len(TRIO)} slice oracles match "
          f"(artifact: {ARTIFACT})")
    sys.exit(1 if fails else 0)


main()
