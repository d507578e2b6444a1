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

  test("append-mode session stream writes to a parquet FILE sink") {
    // the scored queries use the memory sink (driver-harness contract:
    // the result comes back as a DataFrame); this proves the SAME
    // streaming frame runs against the production-shaped file sink —
    // the 100-TB path, where results append to parquet/delta instead
    // of collecting to the driver
    val out = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val agg = graft.streaming.Streams.sessionFrame(s, d)
    val q = agg.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    val fromFile = s.read.parquet(out)
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n"), col("total"))
      .orderBy(col("user_id"), col("session_start"))
      .collect().toSeq
    val scored = SparkEntry.queries("s_session")(s, d)
      .select(col("user_id"), col("session_start"), col("n"), col("total"))
      .collect().toSeq
    assert(fromFile == scored)
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

  test("s_join_stream equals the batch interval join") {
    val streamed = SparkEntry.queries("s_join_stream")(s, d).collect().toSeq
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pt"), col("value").as("pv"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("ct"),
        col("value").as("cv"))
    val batch = p.join(c, col("user_id") === col("cu") &&
        col("ct") >= col("pt") - expr("INTERVAL 2 HOURS") &&
        col("ct") <= col("pt"))
      .select(col("user_id"),
        unix_micros(col("pt")).as("purchase_us"),
        unix_micros(col("ct")).as("click_us"),
        graft.ops.Det.r2(col("pv")).as("purchase_value"),
        graft.ops.Det.r2(col("cv")).as("click_value"))
      .orderBy(col("user_id"), col("purchase_us"), col("click_us"),
        col("purchase_value"), col("click_value"))
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
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

  test("s_foreach_upsert: stale rows never overwrite, every row audited") {
    val rows = SparkEntry.queries("s_foreach_upsert")(s, d)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // u2's batch-2 row (09:50, 99.0) is OLDER than its target state
    // (10:05, 20.0): value must survive, audit count must include it
    assert(rows(2L) == ((1704103500000000L, 20.0, 2L)),
      "stale update rejected but counted")
    // u1: batch-2 advanced it, batch-3's 09:00 row is stale
    assert(rows(1L)._2 == 30.0 && rows(1L)._3 == 3L)
    // u3: inserted then updated in order
    assert(rows(3L)._2 == 7.0 && rows(3L)._3 == 2L)
  }
}
