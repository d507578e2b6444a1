package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-input robustness gate: the correctness oracle always runs on
  * populated tables, but a library user's first contact with every
  * operator is often an empty one — a fresh dataset, a filtered-out
  * partition, a dry run. Each batch query must PLAN and EXECUTE
  * against a fully empty copy of the star schema without throwing
  * (zero rows out is fine; an exception is a defect — the classic
  * failures are sum()→null arithmetic, max() on nothing feeding a
  * require(), and seq heads). Streaming queries are excluded: their
  * harness replays fixture rows by construction.
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty")
    Scratch.deleteOnExit(dir.toString)
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    for (n <- names)
      Tables.t(s, SparkTestBase.sfDir, n).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    // events must keep its RAW long ts (Tables.events converts after
    // the read), so copy the pre-conversion schema
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.t(s, SparkTestBase.sfDir, "events").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted if name.startsWith("q_"))
    test(s"$name survives fully empty input tables") {
      val n = SparkEntry.queries(name)(s, emptyDir).collect().length
      assert(n >= 0)
    }
}
