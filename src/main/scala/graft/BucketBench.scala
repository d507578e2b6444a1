package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired measurement for the q_join_bucketed layout (round 10): the
  * scored query proves the co-bucketed join is RESULT-equal to the
  * plain-parquet join and plans zero exchange below the join; this
  * harness proves the amortization claim — pay the shuffle ONCE at
  * write time, then every repeated join on the key runs cheaper —
  * by timing:
  *
  *   layout_write  one-time cost: both sides written bucketBy(N, key)
  *                 (the nightly ingest job's extra work);
  *   plain         per-join cost over raw parquet: SMJ with BOTH
  *                 sides exchanged every query;
  *   bucketed      per-join cost over the bucketed tables: SMJ with
  *                 no exchange.
  *
  * Break-even = layout_write / (plain − bucketed): how many joins on
  * the key repay the layout. At 100 TB the plain join's exchange is
  * the full fact-table shuffle over the cluster network, so the
  * per-join gap — bounded here by a single box's memory bandwidth —
  * widens with cluster size while the write-side cost is work the
  * ingest job already does once. Broadcast is disabled throughout
  * (the lever targets fact⋈fact joins too big to broadcast). Both
  * shapes must produce the identical aggregate (asserted; Det.r2 on
  * the sum — summation order differs between plans by construction).
  *
  * Usage: graft.BucketBench <sfDir>
  */
object BucketBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    // bucket count is a layout parameter: a deployment sizes it to
    // O(cluster cores) — measuring 8 (the scored query's test-SF
    // value) against 32 (= this box's cores) separates the layout win
    // from the parallelism handicap an under-bucketed table carries
    val NBuckets = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    def li = Tables.lineitem(s, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity"))
    def ord = Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"))

    def aggOf(j: DataFrame): DataFrame = j
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.ops.Det.r2(sum(col("l_extendedprice"))).as("revenue"))
      .orderBy(col("o_orderpriority"))

    def plain: DataFrame = aggOf(
      li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey")))

    val dir = Scratch.dir("bucketbench")
    def writeLayout(): Unit = {
      li.write.mode("overwrite")
        .bucketBy(NBuckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/li").saveAsTable("bb_li")
      ord.write.mode("overwrite")
        .bucketBy(NBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/ord").saveAsTable("bb_ord")
    }
    def bucketed: DataFrame = aggOf(
      s.table("bb_li").join(s.table("bb_ord").hint("merge"),
        col("l_orderkey") === col("o_orderkey")))

    def time[A](f: => A): Double = {
      System.gc()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def rows(df: DataFrame): Array[(String, Long, Double)] =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def same(a: Array[(String, Long, Double)],
             b: Array[(String, Long, Double)]): Boolean =
      a.length == b.length && a.zip(b).forall { case (x, y) =>
        x._1 == y._1 && x._2 == y._2 &&
          math.abs(x._3 - y._3) <= 1e-9 * math.max(math.abs(x._3), 1.0)
      }

    // warm the scan/codegen path, then time the one-time layout write
    rows(plain)
    writeLayout()                       // warm (tables exist for reads below)
    val wSec = time(writeLayout())      // timed re-write, steady-state
    // two timed passes per join shape, min; results must agree
    val ref = rows(plain)
    def minOf2(mk: => DataFrame): Double = {
      val t1 = time(require(same(rows(mk), ref), "result drift"))
      val t2 = time(require(same(rows(mk), ref), "result drift"))
      math.min(t1, t2)
    }
    val pSec = minOf2(plain)
    val bSec = minOf2(bucketed)
    val breakEven =
      if (pSec > bSec) (wSec / (pSec - bSec)).ceil.toLong else -1L
    println(s"""{"metric":"bucket_bench","nbuckets":$NBuckets,""" +
      s""""sf":"$sfDir","sec":{"layout_write":$wSec,"plain":$pSec,""" +
      s""""bucketed":$bSec},"break_even_joins":$breakEven}""")
    spark.stop()
  }
}
