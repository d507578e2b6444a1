package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-equivalence harness for the streaming slice (SURVEY.md §5):
  * the streaming result must equal the same aggregation computed as a
  * plain batch query on the same data (modulo watermark-closed scope,
  * which only affects s_session — asserted there via the oracle). */
class StreamingSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("s_tumble equals the batch tumbling aggregation") {
    val streamed = SparkEntry.queries("s_tumble")(s, d).collect().toSeq
    val batch = Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.ops.Det.r2(sum(col("value"))).as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"), col("total"))
      .orderBy(col("wstart"), col("event_type"))
      .collect().toSeq
    assert(streamed == batch)
  }

  test("s_stateful_dedup equals batch count-distinct") {
    val streamed = SparkEntry.queries("s_stateful_dedup")(s, d).collect().toSeq
    val batch = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_distinct_users"))
      .orderBy(col("event_type"))
      .collect().toSeq
    assert(streamed == batch)
  }

  test("s_late drops exactly the behind-watermark row") {
    val rows = SparkEntry.queries("s_late")(s, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // batch 2's 10:05 duplicate is NOT counted (window closed at wm
    // 10:30); its on-time rows are.
    assert(rows == Seq(
      ("2024-01-01 10:00:00", "A", 2L), ("2024-01-01 10:00:00", "B", 1L),
      ("2024-01-01 10:30:00", "A", 2L), ("2024-01-01 10:30:00", "B", 1L)))
  }
}
