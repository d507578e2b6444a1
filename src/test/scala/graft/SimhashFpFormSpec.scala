package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** The r15 lane-packed simhash aggregation (32 packed
  * `sum((wh >> k) & 0x1_0000_0001)` buffers + one count) must produce
  * bit-identical fingerprints to the original 64-buffer ±1 CASE-sum
  * formulation — six scored queries (dedup_simhash, dedup_cc,
  * pagerank, pagerank_conv, triangles, keeper) and their DuckDB
  * oracles all hang off these fp values. The algebra being pinned:
  * with c_k = |words with bit k set| and n = |words|,
  * old s_k = (+1)·c_k + (−1)·(n − c_k) = 2·c_k − n, so
  * s_k ≥ 0 ⟺ 2·c_k ≥ n — all integer arithmetic. The packed form
  * extracts c_k and c_{k+32} from lanes 0 and 32 of one long sum;
  * carries are impossible while n < 2^31. */
class SimhashFpFormSpec extends AnyFunSuite {
  private def s = SparkTestBase.spark

  private val SimBits = 64
  private def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** The pre-r15 formulation, verbatim. */
  private def fpOld(texts: Seq[String]) = {
    val wh = col("wh")
    val sums = (0 until SimBits).map(k =>
      sum(when(shiftright(wh, k).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"s$k"))
    val fp = (0 until SimBits).map(k =>
      when(col(s"s$k") >= 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce(_ + _)
    base(texts)
      .groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), fp.as("fp"))
  }

  /** The r15 lane-packed formulation, matching LlmExt.simhashFps. */
  private def fpNew(texts: Seq[String]) = {
    val wh = col("wh")
    val lanes = (0 until SimBits / 2).map(k =>
      sum(shiftright(wh, k).bitwiseAND(lit(0x0000000100000001L)))
        .as(s"s$k"))
    val fp = (0 until SimBits).map { k =>
      val c = if (k < 32) col(s"s$k").bitwiseAND(lit(0xFFFFFFFFL))
        else shiftrightunsigned(col(s"s${k - 32}"), 32)
      when(c * 2 >= col("nw"), lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    base(texts)
      .groupBy(col("doc_id"))
      .agg(lanes.head, (lanes.tail :+ count(lit(1)).as("nw")): _*)
      .select(col("doc_id"), fp.as("fp"))
  }

  private def base(texts: Seq[String]) = {
    val spark = s
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), h60(col("word")).as("wh"))
  }

  test("lane-packed fp equals the 64-buffer ±1 fp on generated corpora") {
    val word = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.const(""), // multi-space runs: empty tokens hash too
      Gen.listOf(Gen.chooseNum(0x10000, 0x10ffff))
        .map(_.take(2).flatMap(cp => Character.toChars(cp).toSeq).mkString))
    val textGen = Gen.oneOf(
      Gen.nonEmptyListOf(word).map(_.mkString(" ")),
      Gen.const(""), Gen.const("x"), Gen.const("a a a b"),
      // heavy repetition: exercises ties where 2·c_k == n exactly
      Gen.chooseNum(1, 40).flatMap(k =>
        Gen.listOfN(2, word).map(ws => List.fill(k)(ws.mkString(" "))
          .mkString(" "))))
    val p = Prop.forAll(Gen.listOfN(24, textGen)) { xs =>
      val o = fpOld(xs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val n = fpNew(xs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ok = o == n
      if (!ok) println(s"fp form mismatch: old=$o new=$n")
      ok
    }
    val r = check(Parameters.default.withMinSuccessfulTests(6), p)
    assert(r.passed, r.status.toString)
  }

  test("tie bit: a doc where exactly half the words set a bit") {
    // two distinct words w1, w2 repeated equally: for any bit where
    // they disagree, c_k = n/2 and the old sum is exactly 0 → bit SET
    // (s_k >= 0); the packed form must take the same side of the tie
    val xs = Seq("alpha beta alpha beta", "q", "")
    val o = fpOld(xs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = fpNew(xs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(o == n)
  }
}
