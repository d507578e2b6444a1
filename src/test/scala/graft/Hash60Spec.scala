package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** graft_hash60's entire contract is equality with the composable
  * formulation `conv(substring(md5(x), 1, 15), 16, 10)` — that string
  * form is what every DuckDB oracle still runs, so any divergence is
  * a silent correctness bug in the whole sampling family. Checked
  * over random strings (including empty, unicode, and md5 inputs
  * whose digest starts with zero nibbles, where a naive hex parse
  * could drop leading zeros). */
class Hash60Spec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark

  test("graft_hash60 equals the conv/substring/md5 string formulation") {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val strGen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.chooseNum(32, 0x2fff)).map(
        _.map(_.toChar).mkString),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString))
    val p = Prop.forAll(Gen.listOfN(64, strGen)) { xs =>
      val rows = xs.toDF("x")
        .select(
          expr("graft_hash60(x)").as("fast"),
          conv(substring(md5($"x"), 1, 15), 16, 10).cast("long").as("ref"))
        .collect()
      rows.forall { r =>
        val ok = r.getLong(0) == r.getLong(1) && r.getLong(0) >= 0
        if (!ok) println(s"hash60 mismatch: $r")
        ok
      }
    }
    val r = check(Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  test("graft_hash60 stays inside whole-stage codegen") {
    graft.functions.GraftFunctions.register(s)
    // a literal frame constant-folds to LocalTableScan; a parquet scan
    // forces the real projection pipeline the scored queries run
    val plan = Tables.orders(s, SparkTestBase.sfDir)
      .select(expr("graft_hash60(cast(o_orderkey as string))"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix is how executedPlan.toString marks operators
    // fused into a WholeStageCodegen span
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
  }
}
