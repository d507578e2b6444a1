package graft

import graft.plans.TopK
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k operator must be a drop-in for the declarative
  * row_number formulation: same rows, same ranks, with the partial
  * prune visible in the physical plan. */
class TopKSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private def topkQuery() = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  test("rewrite fires and plans the partial/final operators") {
    TopK.install(s)
    val str = topkQuery().queryExecution.executedPlan.toString
    assert(str.contains("PartialTopK"), s"expected PartialTopK in:\n$str")
    assert(str.contains("FinalTopK"))
    // the builtin WindowGroupLimit pre-prune must be subsumed, and the
    // window machinery gone entirely
    assert(!str.contains("WindowGroupLimit"))
    assert(!str.contains("RunningWindowFunction") && !str.contains("Window ["))
  }

  test("custom operator result equals the window formulation") {
    // baseline WITHOUT the rule: fresh session keeps its own
    // experimental methods — use a cloned session sans installs
    val plain = s.newSession()
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = Tables.orders(plain, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
      .collect().toSeq

    TopK.install(s)
    val got = topkQuery().collect().toSeq
    assert(got == expected)
  }

  test("rewrite leaves non-matching window queries untouched") {
    TopK.install(s)
    // rank() (not row_number) must NOT be rewritten
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(s, d)
      .withColumn("r", rank().over(w).cast("long"))
      .filter(col("r") <= 2)
    val str = df.queryExecution.executedPlan.toString
    assert(!str.contains("PartialTopK") && !str.contains("FinalTopK"))
    assert(df.count() > 0)
  }

  test("collect() works when the Filter has no Project above it") {
    // regression: FinalTopKExec must emit UnsafeRow — a bare
    // withColumn+filter+collect (no select) crashed with
    // ClassCastException before the UnsafeProjection wrap
    TopK.install(s)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val rows = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect()
    assert(rows.nonEmpty)
  }

  test("negative or wrapping rank limits are not rewritten") {
    TopK.install(s)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= lit(-4294967293L)) // low 32 bits == 3
    val str = df.queryExecution.executedPlan.toString
    assert(!str.contains("PartialTopK") && !str.contains("FinalTopK"))
    assert(df.count() == 0) // always-false predicate stays always-false
  }

  test("global top-k (empty partitionBy) is left to the builtin path") {
    TopK.install(s)
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
    val str = df.queryExecution.executedPlan.toString
    assert(!str.contains("PartialTopK") && !str.contains("FinalTopK"))
    assert(df.count() == 5) // and it still executes fine
  }
}
