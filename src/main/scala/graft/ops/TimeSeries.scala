package graft.ops

import graft.{QueryModule, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series operators over the events log: OHLC downsampling (the
  * bar/candle aggregation every metrics store runs) and rolling
  * z-score anomaly detection. Both are reference A28/A29-adjacent
  * (count/sort over time) pushed to the shapes a 100 TB telemetry
  * pipeline actually needs: downsampling collapses the raw log at the
  * FIRST aggregation and anomaly scoring is a single sort-window pass
  * per series.
  */
object TimeSeries extends QueryModule {

  // --------------------------------------------------------- q_ts_downsample

  /** OHLC downsampling: per (event_type, hour) emit open / high /
    * low / close / count / sum. open and close are `min_by`/`max_by`
    * keyed on the raw timestamp (unique in this data — asserted in
    * TimeSeriesSpec — so the pick is deterministic without a
    * tie-break column). The whole query is ONE map-side-combined hash
    * aggregation: min_by/max_by carry (value, key) partials, so 100 TB
    * of raw events collapses to |types × hours| rows before the only
    * shuffle — no sort, no window. Contrast the window formulation
    * (row_number = 1 per bucket), which would sort every partition of
    * the full log. */
  private def tsDownsample(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
        col("ts"), col("value"))
      .groupBy(col("event_type"), col("hr"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("n_events"),
        Det.r4(sum(col("value"))).as("sum_val"))
      .select(col("event_type"), unix_micros(col("hr")).as("hour_us"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("sum_val"))
      .orderBy(col("event_type"), col("hour_us"))

  private val tsDownsampleSql =
    s"""WITH e AS (
       |  SELECT event_type,
       |         date_trunc('hour', make_timestamp(epoch_us(ts))) AS hr,
       |         make_timestamp(epoch_us(ts)) AS tsu, value
       |  FROM events)
       |SELECT event_type, epoch_us(hr) AS hour_us,
       |       arg_min(value, tsu) AS open,
       |       max(value) AS high,
       |       min(value) AS low,
       |       arg_max(value, tsu) AS close,
       |       count(*) AS n_events,
       |       ${Det.sql4("sum(value)")} AS sum_val
       |FROM e GROUP BY event_type, hr
       |ORDER BY event_type, hour_us""".stripMargin

  // ----------------------------------------------------------- q_ts_anomaly

  /** Rolling z-score anomaly detection: per event_type, each point is
    * scored against the mean/stddev of the PRECEDING 100 points (frame
    * excludes the current row — the point under test must not shift
    * its own baseline), flagged when |z| > 3 with a 30-point warm-up
    * and a degenerate-variance guard. One shuffle on event_type + one
    * in-partition sort; the frame is bounded (101 rows of state per
    * series position), so a 10⁹-point series streams through the
    * window operator without materializing anything frame-squared.
    * Series count is the parallelism floor at 100 TB — five types
    * means five tasks, so a real deployment keys the window by
    * (series, day) to re-widen; the per-frame math is unchanged. */
  private def tsAnomaly(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"))
      .rowsBetween(-100, -1)
    T.events(s, d)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sd", stddev_samp(col("value")).over(w))
      .withColumn("nw", count(lit(1)).over(w))
      .filter(col("nw") >= 30 && col("sd") > 1e-9 &&
        abs((col("value") - col("mu")) / col("sd")) > 3.0)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("value"),
        Det.r4((col("value") - col("mu")) / col("sd")).as("z"))
      .orderBy(col("event_id"))
  }

  private val tsAnomalySql =
    s"""WITH w AS (
       |  SELECT event_id, event_type, epoch_us(make_timestamp(epoch_us(ts))) AS tus,
       |         value,
       |         avg(value) OVER win AS mu,
       |         stddev_samp(value) OVER win AS sd,
       |         count(*) OVER win AS nw
       |  FROM events
       |  WINDOW win AS (PARTITION BY event_type ORDER BY ts
       |                 ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING))
       |SELECT event_id, event_type, tus, value,
       |       ${Det.sql4("(value - mu) / sd")} AS z
       |FROM w
       |WHERE nw >= 30 AND sd > 1e-9 AND abs((value - mu) / sd) > 3.0
       |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ts_downsample" -> (tsDownsample _),
    "q_ts_anomaly" -> (tsAnomaly _),
  )

  val oracles: Map[String, String] = Map(
    "q_ts_downsample" -> tsDownsampleSql,
    "q_ts_anomaly" -> tsAnomalySql,
  )
}
