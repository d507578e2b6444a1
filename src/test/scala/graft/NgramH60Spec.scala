package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** graft_ngram_h60's entire contract is equality with the composable
  * lambda formulation
  *   transform(sequence(1, size(w) − width + 1),
  *     i -> graft_hash60(concat_ws(' ', slice(w, i, width))))
  * over w = split(text, ' ') — that per-gram md5 string form is what
  * the q_llm_dsir_weight DuckDB oracle still runs, so any divergence
  * is a silent correctness bug in the DSIR bucket LM. The byte-range
  * digest trick (a gram's joined string IS a slice of the original
  * text) must survive multi-space runs (empty tokens), leading and
  * trailing spaces (trailing empties kept — split's limit=-1), and
  * multibyte UTF-8; docs with fewer than `width` words must yield an
  * EMPTY array like the size guard did. */
class NgramH60Spec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  private def refExpr(width: Int) =
    s"""CASE WHEN size(split(t, ' ')) >= $width THEN
       |  transform(sequence(1, size(split(t, ' ')) - ${width - 1}),
       |    i -> graft_hash60(concat_ws(' ', slice(split(t, ' '), i, $width))))
       |ELSE array() END""".stripMargin

  test("graft_ngram_h60 equals the split/concat/graft_hash60 lambda form") {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.listOf(Gen.chooseNum(33, 0x2fff)).map(_.map(_.toChar).take(4).mkString),
      // supplementary-plane code points (4-byte UTF-8, surrogate
      // pairs) — the byte-range digest must agree with the string
      // form on them too (advice r14)
      Gen.listOf(Gen.chooseNum(0x10000, 0x10ffff))
        .map(_.take(3).flatMap(cp => Character.toChars(cp).toSeq).mkString))
    val textGen = Gen.oneOf(
      Gen.listOf(word).map(_.mkString(" ")),
      // pathological spacing: empty tokens everywhere
      Gen.listOf(Gen.oneOf(word, Gen.const(""))).map(_.mkString(" ")),
      Gen.const(""), Gen.const(" "), Gen.const("  a  b "))
    val p = Prop.forAll(Gen.listOfN(32, textGen), Gen.chooseNum(1, 4)) {
      (xs, width) =>
        val rows = xs.toDF("t")
          .select(
            expr(s"graft_ngram_h60(t, $width)").as("fast"),
            expr(refExpr(width)).as("ref"))
          .collect()
        rows.forall { r =>
          val ok = r.getSeq[Long](0) == r.getSeq[Long](1)
          if (!ok) println(s"ngram_h60 mismatch (width=$width): $r")
          ok
        }
    }
    val r = check(Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  test("graft_ngram_h60 stays inside whole-stage codegen") {
    graft.functions.GraftFunctions.register(s)
    val plan = Tables.documents(s, SparkTestBase.sfDir)
      .select(expr("graft_ngram_h60(text, 2)"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
  }
}
