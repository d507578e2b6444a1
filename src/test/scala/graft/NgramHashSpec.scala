package graft

import graft.functions.NgramHash
import org.apache.spark.sql.catalyst.expressions.{Literal, XXH64}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The native gram-hash expression is the front end of the whole
  * dedup family, so its semantics are pinned three ways: against an
  * independent Scala reference (chained XXH64 over word hashes),
  * codegen-vs-interpreted agreement, and the split(" ") edge cases
  * (empty string, consecutive/trailing spaces) that the byte scan
  * must reproduce exactly. */
class NgramHashSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  /** Independent reference: split exactly like java/Spark split with
    * -1 limit (empty tokens kept), hash words then chain. */
  private def ref(text: String, width: Int, distinct: Boolean): Seq[Long] = {
    val words = text.split(" ", -1).toSeq
    if (words.length < width) Seq.empty
    else {
      val hw = words.map { w =>
        val b = UTF8String.fromString(w)
        XXH64.hashUnsafeBytes(b.getBaseObject, b.getBaseOffset, b.numBytes, 42L)
      }
      val grams = hw.sliding(width).map(_.foldLeft(42L)((acc, h) =>
        XXH64.hashLong(h, acc))).toSeq
      if (distinct) grams.distinct.sorted else grams
    }
  }

  private def viaDf(text: String, width: Int, distinct: Boolean): Seq[Long] = {
    import s.implicits._
    Seq(text).toDF("text")
      .select(expr(s"graft_ngrams(text, $width, $distinct)").as("g"))
      .collect()(0).getSeq[Long](0)
  }

  test("matches the independent reference on random word lists") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("a", "bb", "ccc", "dddd", "über", "naïve")
    val doc = Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, word))
    val width = Gen.oneOf(1, 2, 3, 4, 8)
    val p = Prop.forAll(doc, width, Gen.oneOf(true, false)) { (ws, k, dist) =>
      val text = ws.mkString(" ")
      val got = viaDf(text, k, dist)
      val want = ref(text, k, dist)
      (if (dist) got.sorted else got) == want
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
      .passed)
  }

  test("interpreted eval agrees with the codegen path") {
    for (text <- Seq("", "one", "a b c d e f", "x  y", "tail space ");
         k <- Seq(1, 2, 4); dist <- Seq(true, false)) {
      val e = NgramHash(Literal(UTF8String.fromString(text)), k, dist)
      val interpreted =
        e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray().toSeq
      assert(interpreted == viaDf(text, k, dist),
        s"text='$text' width=$k distinct=$dist")
    }
  }

  test("split-compatible edges: empties, multi-space, width > words") {
    // "" splits to [""] → one word: width 2 gives no grams, width 1 one
    assert(viaDf("", 2, true).isEmpty)
    assert(viaDf("", 1, true).size == 1)
    // "x  y" = ["x", "", "y"] → two 2-grams, kept distinct
    assert(viaDf("x  y", 2, false).size == 2)
    // trailing space = trailing empty token
    assert(viaDf("a b ", 3, false).size == 1)
    assert(viaDf("a b", 3, true).isEmpty)
  }

  test("distinct mode returns the sorted gram set, full mode every position") {
    val rep = "w w w w w w"
    assert(viaDf(rep, 2, false).size == 5)
    assert(viaDf(rep, 2, true).size == 1)
    val g = viaDf("p q r s t u v", 3, true)
    assert(g == g.sorted && g.size == 5)
  }

  test("null text yields null, not a crash") {
    import s.implicits._
    val r = Seq[String](null).toDF("text")
      .select(expr("graft_ngrams(text, 3, true)").as("g")).collect()(0)
    assert(r.isNullAt(0))
  }
}
