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

  /** The live r12 bug, reproduced at its exact hazard point: a cell
    * mean of 46.09875 sits ON the r4 half-boundary, where the old
    * `avg(double)` formulation flipped between runs with the
    * partial-merge order. The exact-grid form must (a) be invariant
    * to partition count AND physical row order, and (b) equal the
    * single fixed IEEE op sequence over the exact long sum — the
    * value both engines are contracted to produce. */
  test("planted r4-boundary mean: exact-grid average is order-invariant") {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => t}
    val schema = t.StructType(Seq(
      t.StructField("g", t.StringType), t.StructField("v", t.DoubleType)))
    // 4096 rows averaging exactly to the 46.09875 boundary; values
    // chosen off-symmetric so the double partial sums genuinely
    // depend on grouping if summed as doubles
    val rows = (0 until 2048).flatMap { i =>
      val eps = (i % 97) * 0.00001
      Seq(Row("a", 46.0987 + eps), Row("a", 46.09880 - eps))
    }
    val expected = { // the contracted fixed op sequence
      val s6 = rows.map(r => math.floor(
        r.getDouble(1) * 1e6 + 0.5).toLong).sum
      math.floor(s6.toDouble / 1e6 / rows.size * 1e4 + 0.5) / 1e4
    }
    val conf = s.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try {
      val got = Seq(("3", 2), ("7", 31), ("13", 64)).map { case (w, p) =>
        conf.set("spark.sql.shuffle.partitions", w)
        s.createDataFrame(rows.asJava, schema)
          .repartition(p) // vary physical order and partial count
          .select(col("g"),
            floor(col("v") * 1e6 + lit(0.5)).cast("long").as("v6"))
          .groupBy(col("g"))
          .agg(graft.ops.Det.r4(
            sum(col("v6")).cast("double") / 1e6 / count(lit(1)))
            .as("m"))
          .collect()(0).getDouble(1)
      }
      assert(got.forall(_ == expected),
        s"boundary mean drifted: got $got, expected $expected")
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }

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
