package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the native function surface hardened in review r13:
  * clean errors for misuse (arity, non-literal args), NULL instead of
  * NaN/plausible-garbage for degenerate data. */
class FunctionContractSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("geo_mean yields NULL (not NaN) for a group with no valid values") {
    val gm = udaf(functions.GeoMean)
    val df = Seq(("a", 2.0), ("a", 8.0), ("b", -1.0), ("b", 0.0))
      .toDF("g", "x")
      .groupBy($"g").agg(gm($"x").as("gmean"))
      .orderBy($"g")
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(1) - 4.0) < 1e-12) // √(2·8)
    assert(rows(1).isNullAt(1),
      "all-invalid group must be NULL — NaN sorts above every numeric " +
        "and passes any > threshold filter")
  }

  test("graft_dot yields NULL on length-mismatched arrays (both paths)") {
    Graft.registerFunctions(spark)
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),   // 1·3 + 2·4 = 11
      (2L, Seq(1.0, 2.0, 9.0), Seq(3.0, 4.0)) // ragged → NULL
    ).toDF("id", "a", "b")
      .withColumn("d", expr("graft_dot(a, b)"))
      .orderBy($"id")
    // codegen'd path
    val rows = df.collect()
    assert(rows(0).getDouble(3) == 11.0)
    assert(rows(1).isNullAt(3), "ragged arrays must surface NULL, not a " +
      "plausible prefix dot product")
    // interpreted eval path (expression evaluated outside codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def arr(xs: Double*) = Literal.create(
      ArrayData.toArrayData(xs.toArray), ArrayType(DoubleType))
    assert(functions.DotProduct(arr(1, 2), arr(3, 4)).eval(null) == 11.0)
    assert(functions.DotProduct(arr(1, 2, 9), arr(3, 4)).eval(null) == null)
  }

  test("wrong arity reads as a clean per-function error, not an " +
      "IndexOutOfBoundsException") {
    Graft.registerFunctions(spark)
    val df = Seq((Seq(1.0), "t")).toDF("a", "t")
    val e1 = intercept[Exception] { df.selectExpr("graft_dot(a)").collect() }
    assert(e1.getMessage.contains("graft_dot expects 2"),
      s"got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      df.selectExpr("graft_hash60(t, t)").collect()
    }
    assert(e2.getMessage.contains("graft_hash60 expects 1"),
      s"got: ${e2.getMessage}")
    val e3 = intercept[Exception] {
      df.selectExpr("graft_ngrams(t)").collect()
    }
    assert(e3.getMessage.contains("graft_ngrams expects 3"),
      s"got: ${e3.getMessage}")
  }

  test("graft_ngrams non-literal / NULL width is a clean named error") {
    Graft.registerFunctions(spark)
    val df = Seq(("a b c d", 2)).toDF("t", "w")
    val e1 = intercept[Exception] {
      df.selectExpr("graft_ngrams(t, w, true)").collect()
    }
    assert(e1.getMessage.contains("must be a literal"), s"got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      df.selectExpr("graft_ngrams(t, cast(null as int), true)").collect()
    }
    assert(e2.getMessage.contains("must not be NULL"), s"got: ${e2.getMessage}")
  }
}
