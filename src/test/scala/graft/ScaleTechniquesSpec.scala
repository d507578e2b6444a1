package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Executable proofs of the scale techniques the engine relies on at
  * 100 TB but that the oracle queries can't surface at test SF:
  * bucketed co-located joins (no exchange) and two-phase salted
  * aggregation for skewed keys. */
class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    // write both sides bucketed on the join key — the 100-TB pattern
    // for repeated fact⋈fact joins: pay the shuffle once at write time
    Tables.orders(s, d).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.customer(s, d).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    val joined = s.table("orders_b")
      .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
    // disable auto-broadcast so the plan decision is bucketing, not size
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == Tables.orders(s, d).count())
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join query equals the plain join it rewrites") {
    // q_join_skew_salted's oracle is the UNSALTED SQL; assert the same
    // equivalence inside Spark so the invariant doesn't depend on the
    // DuckDB gate alone
    val salted = SparkEntry.queries("q_join_skew_salted")(s, d).collect().toSeq
    val plain = Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        graft.ops.Det.r2(sum(col("l_extendedprice"))).as("revenue"))
      .orderBy(col("s_nationkey")).collect().toSeq
    assert(salted.nonEmpty && salted == plain)
  }

  test("salted two-phase aggregation equals direct aggregation on skewed keys") {
    import s.implicits._
    // one hot key carrying 90% of rows — the shape where a plain
    // groupBy sends 90% of the data to one reducer
    val skewed = (1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"key${i % 50}", i.toDouble))
    val df = skewed.toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("total"), count(lit(1)).as("n"))
      .orderBy($"k").collect().toSeq
    // phase 1: spread each key over 16 salts (map-side key explosion);
    // phase 2: merge partials per real key — both shuffles are balanced
    val salted = df
      .withColumn("salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
      .groupBy($"k", $"salt")
      .agg(sum($"v").as("pt"), count(lit(1)).as("pn"))
      .groupBy($"k")
      .agg(sum($"pt").as("total"), sum($"pn").as("n"))
      .orderBy($"k").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))) ==
      direct.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))))
  }
}
