package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed `Aggregator[IN, BUF, OUT]` (SURVEY §2B
  * q_agg_custom). Buffer = (Σ ln x, n): algebraic, so Spark runs it with
  * map-side partial aggregation and a cheap merge — the property that
  * makes a custom aggregate viable at 100 TB. Values ≤ 0 are skipped
  * (ln undefined), mirroring `avg(ln(x))` null-skipping in SQL.
  * Registered with `udaf(...)` so it participates in the UNTYPED
  * groupBy path: the surrounding plan keeps whole-stage codegen (the
  * typed groupByKey alternative forces object serialization around
  * the aggregate).
  *
  * A group with ZERO valid values yields NULL, matching the
  * documented-equivalent `exp(avg(ln(x)))` — NaN would be WORSE than
  * wrong here because Spark orders NaN above every numeric, so an
  * all-invalid group would pass any `> threshold` filter and sort
  * first (review r13). Boxed OUT type is what makes NULL expressible.
  */
object GeoMean extends Aggregator[Double, (Double, Long), java.lang.Double] {
  def zero: (Double, Long) = (0.0, 0L)
  def reduce(b: (Double, Long), a: Double): (Double, Long) =
    if (a > 0.0) (b._1 + math.log(a), b._2 + 1L) else b
  def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  def finish(b: (Double, Long)): java.lang.Double =
    if (b._2 == 0L) null else java.lang.Double.valueOf(math.exp(b._1 / b._2))
  def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
