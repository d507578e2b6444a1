package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the time-series operators: OHLC internal
  * consistency and conservation, rolling-z-score frame semantics —
  * properties the hash gate can't express.
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  import s.implicits._

  test("downsample precondition: event timestamps are unique") {
    // min_by/max_by(value, ts) is only deterministic if ts never ties
    val ev = Tables.events(s, SparkTestBase.sfDir)
    assert(ev.count() == ev.select($"ts").distinct().count())
  }

  test("downsample: OHLC bounds hold and counts conserve the input") {
    val bars = SparkEntry.queries("q_ts_downsample")(s, SparkTestBase.sfDir)
    val bad = bars.filter(
      $"low" > $"high" || $"open" < $"low" || $"open" > $"high" ||
        $"close" < $"low" || $"close" > $"high" || $"n_events" <= 0)
    assert(bad.isEmpty, "low <= open/close <= high within every bar")
    val total = bars.agg(sum($"n_events")).first().getLong(0)
    assert(total == Tables.events(s, SparkTestBase.sfDir).count(),
      "every event lands in exactly one bar")
  }

  test("downsample: open/close match the first/last event of a bar") {
    val ev = Tables.events(s, SparkTestBase.sfDir)
      .select($"event_type", date_trunc("hour", $"ts").as("hr"),
        $"ts", $"value")
    // independent recompute via window row_number instead of min_by
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"hr").orderBy($"ts")
    val firsts = ev
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_type", unix_micros($"hr").as("hour_us"),
        $"value".as("open2"))
    val joined = SparkEntry.queries("q_ts_downsample")(s, SparkTestBase.sfDir)
      .join(firsts, Seq("event_type", "hour_us"))
    assert(joined.filter($"open" =!= $"open2").isEmpty)
  }

  test("wma: warm-up row equals its value, smoother stays in frame bounds") {
    val w = SparkEntry.queries("q_ts_wma")(s, SparkTestBase.sfDir)
    // first row of each series has a 1-row frame: wma == value (r4)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"tus")
    val firsts = w.withColumn("rn", row_number().over(win))
      .filter($"rn" === 1)
      .filter(abs($"wma" - $"value") > 1e-4)
    assert(firsts.isEmpty, "frame of one row averages to the row itself")
    // every wma lies within the frame's [min, max] envelope
    val frame = win.rowsBetween(-20, 0)
    val bad = w
      .withColumn("lo", min($"value").over(frame))
      .withColumn("hi", max($"value").over(frame))
      .filter($"wma" < $"lo" - 1e-4 || $"wma" > $"hi" + 1e-4)
    assert(bad.isEmpty, "weighted average bounded by frame extrema")
  }

  test("interp: observed hours pass through, gaps stay inside anchors") {
    val g = SparkEntry.queries("q_ts_interp")(s, SparkTestBase.sfDir)
    assert(g.filter($"n_events" > 0 &&
      abs($"interp_val" - $"avg_val") > 1e-4).isEmpty,
      "observed grid points keep their own value")
    // interpolated points lie between the surrounding observed values
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"hour_us")
    val back = win.rowsBetween(Long.MinValue, 0)
    val fwd = win.rowsBetween(0, Long.MaxValue)
    val bad = g
      .withColumn("pv", last(when($"n_events" > 0, $"avg_val"), true).over(back))
      .withColumn("nv", first(when($"n_events" > 0, $"avg_val"), true).over(fwd))
      .filter($"n_events" === 0 && $"pv".isNotNull && $"nv".isNotNull)
      .filter($"interp_val" < least($"pv", $"nv") - 1e-4 ||
        $"interp_val" > greatest($"pv", $"nv") + 1e-4)
    assert(bad.isEmpty, "linear interpolation bounded by its anchors")
  }

  test("integer-grid domain guard raises on out-of-domain values") {
    // wma: |value| beyond 1e5 would wrap Σ(v4w·rn) in Long — must
    // raise, not silently diverge from an ANSI engine
    val big = Seq(("a", 1L, 1e7, 1L), ("a", 2L, 2.0, 2L))
      .toDF("event_type", "ts", "value", "event_id")
    val e1 = intercept[Exception] {
      graft.ops.TimeSeries.wmaOver(big, "event_type", "ts", "value", 20,
        tiebreak = Seq("event_id")).collect()
    }
    assert(e1.getMessage.contains("exact-arithmetic domain"),
      s"unexpected failure: ${e1.getMessage}")
    // in-domain values are untouched by the guard
    val ok = Seq(("a", 1L, 99999.0, 1L), ("a", 2L, -99999.0, 2L))
      .toDF("event_type", "ts", "value", "event_id")
    val out = graft.ops.TimeSeries.wmaOver(ok, "event_type", "ts", "value",
      20, tiebreak = Seq("event_id")).collect()
    assert(out.length == 2 && math.abs(
      out.head.getAs[Double]("wma") - 99999.0) < 1e-3)
    // anomaly: |value| beyond √(Long.Max/frame)/1e4 ≈ 3.0e4 would wrap
    // S2 = Σv4² — must raise
    val cells = Seq.tabulate(40)(i =>
        (i.toLong, "a", new java.sql.Timestamp(i * 1000L),
          if (i == 35) 1e6 else 1.0, 0L, false))
      .toDF("event_id", "event_type", "ts", "value", "slice", "carried")
    val e2 = intercept[Exception] {
      graft.ops.TimeSeries.scoreAnomalies(100,
        Seq(col("ts"), col("event_id")))(cells).collect()
    }
    assert(e2.getMessage.contains("exact-arithmetic domain"),
      s"unexpected failure: ${e2.getMessage}")
  }

  test("anomaly: flagged rows exceed the threshold, warm-up respected") {
    val anom = SparkEntry.queries("q_ts_anomaly")(s, SparkTestBase.sfDir)
      .collect()
    // Det.r4 rounding can pull a true |z|>3 down to at most 3.0 - 5e-5
    assert(anom.forall(r => math.abs(r.getAs[Double]("z")) > 2.99),
      "every flagged row has |z| > 3 up to output rounding")
    // warm-up: the first 30 events of each series can never be flagged
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"ts")
    val early = Tables.events(s, SparkTestBase.sfDir)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 30)
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(anom.forall(r => !early.contains(r.getAs[Long]("event_id"))))
  }
}
