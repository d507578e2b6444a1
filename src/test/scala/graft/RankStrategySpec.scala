package graft

import org.scalatest.funsuite.AnyFunSuite

/** The order-statistics family (q_agg_percentile, q_agg_trimmed,
  * q_agg_mad) picks per-group window rank vs two-phase range-split
  * ranking from the source size (`spark.graft.rank.splitMinBytes`).
  * Force both paths on the same data and assert row-for-row equality —
  * the rank strategies may permute ties, but every consumer selects
  * VALUES, which are tie-permutation-invariant, so the results must
  * be identical. */
class RankStrategySpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private def runWith(q: String, minBytes: String): Seq[String] = {
    val child = s.newSession()
    child.conf.set("spark.graft.rank.splitMinBytes", minBytes)
    SparkEntry.queries(q)(child, d).collect().map(_.toString).toSeq
  }

  for (q <- Seq("q_agg_percentile", "q_agg_trimmed", "q_agg_mad")) {
    test(s"$q: simple and range-split rank strategies agree") {
      val simple = runWith(q, Long.MaxValue.toString)
      val split = runWith(q, "0")
      assert(simple.nonEmpty, s"$q produced rows")
      assert(simple == split,
        s"$q strategy divergence: simple=$simple split=$split")
    }
  }
}
