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

  test("thumb resamples the decoded raster by the explicit NN rule") {
    val rows = SparkEntry.queries("q_llm_thumb")(s, SparkTestBase.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = (1 + id % 8, 1 + (id / 8) % 8)
      def px(x: Long, y: Long): Long = (id + 17 * x + 31 * y) % 256
      assert(r.getAs[Long]("p00") == px(0, 0), s"doc $id p00")
      assert(r.getAs[Long]("p10") == px(w / 2, 0), s"doc $id p10")
      assert(r.getAs[Long]("p01") == px(0, h / 2), s"doc $id p01")
      assert(r.getAs[Long]("p11") == px(w / 2, h / 2), s"doc $id p11")
      // a resample roughly preserves brightness: the planted gradient
      // spans < 256, so thumb mean and full mean stay within one ramp
      val shift = r.getAs[Double]("brightness_shift")
      assert(math.abs(shift) <= 255.0, s"doc $id brightness shift $shift")
    }
  }

  test("frames samples stride-2 and decodes exactly those frames") {
    val rows = SparkEntry.queries("q_llm_frames")(s, SparkTestBase.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nf = 4 + id % 5
      assert(r.getAs[Long]("n_frames") == nf)
      assert(r.getAs[Long]("n_sampled") == (nf + 1) / 2,
        s"doc $id stride-2 count")
      val expected = (for {
        f <- 0L until nf by 2; x <- 0L to 1; y <- 0L to 1
      } yield (id + 7 * f + 17 * x + 31 * y) % 256).sum
      assert(r.getAs[Long]("frame_sum") == expected,
        s"doc $id sampled-frame checksum — decode must be lossless")
    }
    // all five video lengths (4..8 frames) appear in the corpus
    assert(rows.map(_.getAs[Long]("n_frames")).distinct.sorted.toSeq ==
      (4L to 8L), "frame-count range covered")
  }
}
