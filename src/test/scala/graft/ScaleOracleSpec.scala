package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural contract of the large-SF oracle variants
  * ([[QueryModule.scaleOracles]]): a scale oracle SUBSTITUTES for a
  * primary oracle in the sf3 gate (tools/check.py --scale-oracle), so
  * every variant must shadow an existing key, actually differ from
  * the primary, and target only queries whose primary formulation is
  * the documented intractable class. VALUE equivalence cannot run in
  * this JVM (the oracles are DuckDB SQL — no DuckDB on the test
  * classpath); it is established by running the gate twice at a small
  * SF where both formulations are tractable: primary and variant each
  * match the SAME engine dump (r11 session: 3/3 at sf0.01 both modes,
  * 3/3 at sf3 with the variants). */
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
