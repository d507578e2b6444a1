package graft

import org.scalatest.funsuite.AnyFunSuite

/** A10 log sink: the QueryExecutionListener fires per completed query
  * (the log4j2 RollingFile routing is deployment config —
  * src/main/resources/graft-log4j2.xml — not unit-testable state). */
class QueryLoggerSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("listener fires on query completion") {
    GraftQueryLogger.install(s)
    val before = GraftQueryLogger.fired.get()
    import s.implicits._
    Seq(1, 2, 3).toDF("x").groupBy().sum("x").collect()
    // listener callbacks are async (posted to the listener bus)
    val deadline = System.nanoTime() + 5_000_000_000L
    while (GraftQueryLogger.fired.get() == before &&
           System.nanoTime() < deadline) Thread.sleep(50)
    assert(GraftQueryLogger.fired.get() > before,
      "QueryExecutionListener did not fire within 5s")
  }
}
