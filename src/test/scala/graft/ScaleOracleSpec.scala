package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural contract of the large-SF oracle variants
  * ([[QueryModule.scaleOracles]]): a scale oracle SUBSTITUTES for a
  * primary oracle in the sf3 gate (tools/check.py --scale-oracle), so
  * every variant must shadow an existing key, actually differ from
  * the primary, and target only queries whose primary formulation is
  * the documented intractable class. VALUE equivalence cannot run in
  * this JVM (the oracles are DuckDB SQL — no DuckDB on the test
  * classpath); it is a checked-in gate mode instead:
  * `tools/check.py --dual-oracle` runs primary AND variant against
  * the SAME engine dump (r12: 3/3×2 at sf0.01), and
  * `tools/slice_check.py` adds ENGINE-INDEPENDENT sf3 evidence — the
  * expanded primary formulation on a closure-verified sampled
  * subgraph (SLICE_CHECK.json: 3/3 exact at sf3). */
class ScaleOracleSpec extends AnyFunSuite {

  test("every scale oracle shadows a primary oracle key") {
    val primary = SparkEntry.oracleSql.keySet
    val scale = SparkEntry.oracleSqlScale.keySet
    assert(scale == primary,
      "scale map must be the primary map with substitutions only — " +
        s"extra keys: ${(scale -- primary).toSeq.sorted}; " +
        s"missing: ${(primary -- scale).toSeq.sorted}")
  }

  test("scale variants differ from their primaries and stay scoped") {
    val subs = SparkEntry.oracleSqlScale.filter { case (k, v) =>
      SparkEntry.oracleSql(k) != v
    }.keySet
    // the documented intractable class: the iterative graph trio whose
    // primary oracles are recursive CTEs over the EXPANDED pair graph
    assert(subs == Set("q_llm_dedup_cc", "q_graph_pagerank_conv",
      "q_llm_keeper"),
      s"unexpected scale-oracle substitution set: ${subs.toSeq.sorted}")
  }

  test("the pagerank variant iterates exactly the engine's PrIters chain") {
    val sql = SparkEntry.oracleSqlScale("q_graph_pagerank_conv")
    // one pr<i> CTE definition per iteration plus the pr0 base
    val defs = raw"pr\d+ AS".r.findAllIn(sql).size
    assert(defs == 13, s"expected pr0 + 12 iteration CTEs, found $defs")
    assert(sql.contains("JOIN pr12 "), "final select must read pr12")
  }

  test("slice oracles cover the graph family plus the two harness guards") {
    val keys = SparkEntry.oracleSqlSlice.keySet
    assert(keys == Set("q_llm_dedup_cc", "q_graph_pagerank_conv",
      "q_llm_keeper", "q_graph_triangles", "__n_nodes", "__closure"),
      s"unexpected slice-oracle key set: ${keys.toSeq.sorted}")
  }

  test("slice oracles are EXPANDED formulations over the harness tables") {
    // the whole point of the slice gate (VERDICT r11 #1) is
    // independence from the engine's contraction identities: the trio
    // variants must restrict `fps` through slice_docs and must NOT
    // reuse the class-contraction CTEs (part/du/ce/od — the scale
    // variants' machinery); the rank queries must take n from the
    // harness-computed global_n, never recount it from slice degrees
    for (name <- Seq("q_llm_dedup_cc", "q_graph_pagerank_conv",
        "q_llm_keeper", "q_graph_triangles")) {
      val sql = SparkEntry.oracleSqlSlice(name)
      assert(sql.contains("JOIN slice_docs"), s"$name: no slice restriction")
      assert(sql.contains("FROM fs a JOIN fs b ON a.doc_id < b.doc_id"),
        s"$name: edge enumeration must be the expanded pairwise join")
      for (cte <- Seq("part AS", "du AS", "ce AS", "od AS"))
        assert(!sql.contains(cte),
          s"$name: slice oracle reuses class-contraction CTE `$cte`")
      if (name == "q_graph_pagerank_conv" || name == "q_llm_keeper")
        assert(sql.contains("SELECT n FROM global_n"),
          s"$name: rank n must be injected from global_n")
    }
    // the guards may group by fp (the data-level tautology) but must
    // not touch reachability or rank algebra
    for (name <- Seq("__n_nodes", "__closure")) {
      val sql = SparkEntry.oracleSqlSlice(name)
      assert(!sql.contains("RECURSIVE") && !sql.contains("rank"),
        s"$name: guard must stay iteration-free")
    }
    assert(SparkEntry.oracleSqlSlice("__closure").contains("slice_docs"))
  }

  test("recursive-WITH variants avoid bare UNION inside MATERIALIZED CTEs") {
    // DuckDB 1.0 drops UNION's distinct when the CTE is MATERIALIZED
    // under WITH RECURSIVE (repro'd r11; it silently doubled every
    // both-branch class at sf3). Guard the shape so a future edit
    // can't reintroduce it: inside a WITH RECURSIVE statement, every
    // MATERIALIZED CTE body must spell dedup as DISTINCT, not UNION.
    for ((name, sql) <- SparkEntry.oracleSqlScale
         if sql != SparkEntry.oracleSql(name)
         if sql.contains("WITH RECURSIVE")) {
      val bodies = sql.split(raw"AS MATERIALIZED \(").drop(1)
      bodies.foreach { body =>
        // the CTE body ends at the first top-level close; a cheap
        // over-approximation (scan to the matching paren) suffices
        var depth = 1
        val b = body.takeWhile { c =>
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          depth > 0
        }
        val bare = raw"\bUNION\b(?!\s+ALL)".r.findFirstIn(b)
        assert(bare.isEmpty || b.contains("SELECT DISTINCT"),
          s"$name: bare UNION inside a MATERIALIZED CTE under WITH " +
            "RECURSIVE — DuckDB 1.0 loses the distinct; use " +
            "SELECT DISTINCT over UNION ALL")
      }
    }
  }
}
