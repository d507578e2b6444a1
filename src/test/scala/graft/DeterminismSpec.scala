package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-invariance gate for the determinism contracts the
  * oracle can only check once per run: the pure-projection sampling
  * family claims re-runs, engines AND partitionings agree row-for-row
  * (the reason it uses key hashes instead of RNG), and the
  * discretize-before-aggregate family (semdedup centroids, DSIR
  * weight sums) claims summation ORDER cannot leak into output. A
  * different shuffle-partition count changes both the physical
  * layouts and the floating-point accumulation order, so running the
  * same query under several counts and demanding identical output
  * makes those claims executable — this is exactly what changes
  * between a 32-thread test box and a 1000-executor cluster. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private val names = Seq(
    "q_sample_hash",           // md5 key-hash Bernoulli sample
    "q_llm_sample_importance", // hash-vs-score importance sampler
    "q_llm_domain_cap",        // hash-rank per-domain cap (TopK path)
    "q_llm_dsir_weight",       // r6-term sums (order-sensitive if wrong)
    "q_llm_semdedup",          // r6 centroids -> cosine drop rule
    // exact-grid money/value aggregates (r12): avg / off-grid sums
    // rewritten to order-independent long sums after a live r4
    // boundary flip in q_ts_interp — these pin the formulation
    "q_agg_hash",              // Q1 cents/1e-4 sums + avgs
    "q_agg_trimmed",           // cents-grid trimmed mean
    "q_agg_histogram",         // cents-grid per-bucket mean
    "q_ts_downsample",         // 1e-6-grid OHLC sum
    "q_ts_gapfill",            // 1e-6-grid cell average
    "q_ts_interp")             // 1e-6-grid cell average

  for (name <- names)
    test(s"$name: identical output under different shuffle partitionings") {
      val conf = s.conf
      val orig = conf.get("spark.sql.shuffle.partitions")
      def run(): Seq[String] =
        SparkEntry.queries(name)(s, SparkTestBase.sfDir)
          .collect().map(_.toString).toSeq
      try {
        val outs = Seq("4", "7", "13").map { n =>
          conf.set("spark.sql.shuffle.partitions", n)
          run()
        }
        assert(outs(0).nonEmpty)
        assert(outs(0) == outs(1) && outs(1) == outs(2),
          s"$name output depends on shuffle partitioning")
      } finally conf.set("spark.sql.shuffle.partitions", orig)
    }
}
