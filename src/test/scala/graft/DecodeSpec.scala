package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_llm_decode is a REAL javax.imageio round-trip since round 7: the
  * query synthesizes a deterministic PNG per doc and decodes it back.
  * The DuckDB oracle already proves the decoded metadata matches the
  * planted arithmetic; this spec re-derives the expectation in plain
  * Scala (no Spark, no DuckDB) so a codec regression (e.g. a lossy
  * re-encode or channel swap) fails here with the offending doc. */
class DecodeSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("decode reads back planted dimensions and full pixel checksum") {
    val rows = SparkEntry.queries("q_llm_decode")(s, SparkTestBase.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = (1 + id % 8, 1 + (id / 8) % 8)
      assert(r.getAs[String]("fmt") == "png", s"doc $id format sniff")
      assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h,
        s"doc $id decoded dimensions")
      assert(r.getAs[Long]("n_pixels") == w * h)
      val expected = (for {
        x <- 0L until w; y <- 0L until h
      } yield (id + 17 * x + 31 * y) % 256).sum
      assert(r.getAs[Long]("pixel_sum") == expected,
        s"doc $id pixel checksum — decode must be lossless")
    }
    // every width/height in 1..8 appears somewhere (the fixture spans
    // the full size grid once there are ≥64 docs)
    assert(rows.map(_.getAs[Long]("width")).distinct.sorted.toSeq ==
      (1L to 8L), "width range covered")
  }
}
