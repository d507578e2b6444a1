package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired measurement for the q_join_skew_salted rewrite (round 10,
  * verdict r9 #5): the scored query proves the salted plan is
  * RESULT-equal to the plain join; this harness proves it is FASTER
  * under an actual hot key, by planting one (10% of lineitem rows
  * remapped to a single supplier) and timing three shapes:
  *
  *   plain-aqe   plain sort-merge join, AQE skew-split allowed — what
  *               Spark does on its own when the join's partitioning is
  *               NOT needed downstream;
  *   plain-noaqe plain sort-merge join with skew-split disabled — the
  *               regime the salting rewrite exists for (a skewed key
  *               feeding an aggregation that must reuse the join's
  *               partitioning cannot be AQE-split);
  *   salted      the scored query's rewrite: fact side salted in
  *               [0, 8), dim side exploded ×8, join on (key, salt).
  *
  * Broadcast is disabled throughout — a broadcastable dim side would
  * dissolve the experiment (and at 100 TB the dim side of a skewed
  * join is routinely too large to broadcast). All three shapes must
  * produce the identical aggregate (asserted). Two passes each,
  * min taken, one JSON line out (the Bench contract).
  *
  * Usage: graft.SaltBench <sfDir> [hotFrac=0.10]
  */
object SaltBench {
  private val NSalt = 8

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val hotFrac = args.lift(1).map(_.toDouble).getOrElse(0.10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hotKey = 1L
    val mod = math.max(1L, math.round(1.0 / hotFrac))
    // deterministic 1-in-mod remap of the fact-side key to ONE hot
    // supplier — the planted skew
    def facts(s: SparkSession): DataFrame = Tables.lineitem(s, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"),
        when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
          lit(mod)) === 0, lit(hotKey))
          .otherwise(col("l_suppkey")).as("l_suppkey"))
    def dim(s: SparkSession): DataFrame = Tables.supplier(s, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))

    def plain(s: SparkSession): DataFrame =
      facts(s).join(dim(s), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          graft.ops.Det.r2(sum(col("l_extendedprice"))).as("revenue"))
        .orderBy(col("s_nationkey"))

    def salted(s: SparkSession): DataFrame = {
      val li = facts(s).withColumn("salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), lit(7)),
          lit(NSalt)))
      val sup = dim(s).withColumn("salt",
        explode(sequence(lit(0L), lit(NSalt - 1L))))
      li.join(sup, li("l_suppkey") === sup("s_suppkey") &&
          li("salt") === sup("salt"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          graft.ops.Det.r2(sum(col("l_extendedprice"))).as("revenue"))
        .orderBy(col("s_nationkey"))
    }

    def session(skewJoin: Boolean): SparkSession = {
      val s = spark.newSession()
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      s
    }

    // (nation, n_items, revenue) triples; revenue compares under a
    // relative tolerance — double summation order differs between the
    // plans (and between passes of AQE-coalesced plans), which is
    // exactly why the SCORED query discretizes through Det.r2 + an
    // engine-replicated oracle rather than bitwise compare
    def time(f: => DataFrame): (Double, Array[(Long, Long, Double)]) = {
      System.gc()
      val t0 = System.nanoTime()
      val rows = f.collect() // s_nationkey is INT in the source schema
        .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2)))
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    def sameResult(a: Array[(Long, Long, Double)],
                   b: Array[(Long, Long, Double)]): Boolean =
      a.length == b.length && a.zip(b).forall { case (x, y) =>
        x._1 == y._1 && x._2 == y._2 &&
          math.abs(x._3 - y._3) <= 1e-9 * math.max(math.abs(x._3), 1.0)
      }

    val variants = Seq(
      "plain-aqe" -> (() => plain(session(skewJoin = true))),
      "plain-noaqe" -> (() => plain(session(skewJoin = false))),
      "salted" -> (() => salted(session(skewJoin = false))))
    // warm pass (scan/codegen), then two timed passes, min
    variants.foreach(_._2().collect())
    var reference: Array[(Long, Long, Double)] = null
    val results = variants.map { case (name, mk) =>
      val (t1, r1) = time(mk())
      val (t2, r2) = time(mk())
      require(sameResult(r1, r2), s"$name not stable across passes")
      if (reference == null) reference = r1
      else require(sameResult(r1, reference),
        s"$name output differs from plain-aqe")
      name -> math.min(t1, t2)
    }
    val qs = results.map { case (n, t) => s""""$n":$t""" }.mkString(",")
    println(s"""{"metric":"salt_bench","hot_frac":$hotFrac,""" +
      s""""nsalt":$NSalt,"sf":"$sfDir","sec":{$qs}}""")
    spark.stop()
  }
}
