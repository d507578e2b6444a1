package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q_ts_anomaly adaptive-plan contract: the overlap-split
  * strategy (range-slice + exact trailing-frame carry) must produce
  * exactly the rows of the simple per-series window it replaces, so
  * the size-based cutover in TimeSeries.tsAnomaly can never change
  * results — only the physical strategy. Both paths run over the real
  * events table (the test session's 4-way parallelism still slices,
  * carries and re-merges; sf0.001's thin per-cell counts exercise the
  * multi-slice carry that a fat-cell corpus never hits). */
class AnomalySplitSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private def bothPaths(d: String): (Seq[String], Seq[String]) = {
    val frameLen = 100
    val key = Seq(col("ts"), col("event_id"))
    val base = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
    val score = graft.ops.TimeSeries.scoreAnomalies(frameLen, key) _
    val simple = score(base
      .repartition(4, col("event_type"))
      .withColumn("slice", lit(0)).withColumn("carried", lit(false)))
    val split = graft.ops.TimeSeries.overlapSplit(s, base, frameLen, key, score)
    (simple.collect().map(_.toString).toSeq,
      split.collect().map(_.toString).toSeq)
  }

  test("overlap-split equals the simple per-series window (sf0.001, thin cells)") {
    val (simple, split) = bothPaths("/root/testdata/sf0.001")
    assert(simple == split,
      s"paths diverge: simple=${simple.size} split=${split.size} rows")
  }

  test("overlap-split survives independent re-planning of its consumers " +
      "(exchange reuse off — r12 regression)") {
    // The slicing is consumed three times; before r12 the carry's
    // correctness silently depended on Catalyst planning all three
    // subtrees as one ReusedExchange. A full-session run at sf3
    // planned them apart, each re-sampled different range bounds,
    // and 5 boundary rows vanished. reuse=false forces the worst
    // case deterministically; the checkpointed slicing must hold.
    val key = "spark.sql.exchange.reuse"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    try {
      val (simple, split) = bothPaths("/root/testdata/sf0.01")
      assert(simple == split,
        s"paths diverge without exchange reuse: simple=${simple.size} " +
          s"split=${split.size} rows")
    } finally s.conf.set(key, prev)
  }

  test("overlap-split equals the simple per-series window (sf0.01)") {
    val (simple, split) = bothPaths("/root/testdata/sf0.01")
    assert(simple.nonEmpty, "no anomalies at sf0.01 — test has no teeth")
    assert(simple == split,
      s"paths diverge: simple=${simple.size} split=${split.size} rows")
  }
}
