package graft

import org.scalatest.funsuite.AnyFunSuite

/** A10 log sink: the QueryExecutionListener fires per completed query
  * (the log4j2 RollingFile routing is deployment config —
  * src/main/resources/graft-log4j2.xml — not unit-testable state). */
class QueryLoggerSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("streaming listener fires across a query lifecycle") {
    val l = GraftStreamingLogger.install(s)
    try {
      val before = GraftStreamingLogger.fired.get()
      // cheapest real streaming run: one rate-source-free MemoryStream batch
      import s.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Int]
      val sinkName = "slog_" + System.nanoTime()
      val q = mem.toDF().writeStream.format("memory")
        .queryName(sinkName).outputMode("append").start()
      mem.addData(1, 2, 3)
      q.processAllAvailable()
      q.stop()
      s.catalog.dropTempView(sinkName) // don't leak the sink table
      val deadline = System.nanoTime() + 5_000_000_000L
      while (GraftStreamingLogger.fired.get() < before + 3 &&
             System.nanoTime() < deadline) Thread.sleep(50)
      // started + >=1 progress + terminated
      assert(GraftStreamingLogger.fired.get() >= before + 3,
        "StreamingQueryListener did not see start/progress/termination")
    } finally s.streams.removeListener(l)
  }

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
