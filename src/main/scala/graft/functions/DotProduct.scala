package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression for the dense dot product of two
  * ARRAY<DOUBLE> columns, with whole-stage codegen (`doGenCode`
  * emits a tight primitive loop). The composable alternative —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — allocates an
  * intermediate array per row and runs on the interpreted
  * higher-order-function path; on 64-dim embeddings this expression
  * is the difference between an interpreted per-element closure and
  * one fused multiply loop inside the generated code.
  *
  * Semantics: Σ a[i]·b[i]; LENGTH-MISMATCHED arrays yield NULL — the
  * same answer the composable `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * gives, and the honest one: a truncated/corrupt embedding must
  * surface as NULL, not as a plausible-but-skewed prefix dot product
  * that survives ranking (review r13). Null arrays propagate null
  * (BinaryExpression's default null-intolerance); null ELEMENTS are
  * not expected (embeddings are dense) and read as 0.0.
  *
  * Registered per-session under the SQL name `graft_dot` via
  * [[GraftFunctions.register]].
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two ARRAY<DOUBLE> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session-local registration of graft's native expressions. Idempotent;
  * called by query builders that use them. (A library deployment would
  * do this once via SparkSessionExtensions.injectFunction.) */
object GraftFunctions {
  /** Wrong argument counts must read as "graft_dot expects 2
    * arguments, got 1", not an IndexOutOfBoundsException out of the
    * builder (review r13). */
  private[functions] def requireArity(name: String,
      exprs: Seq[Expression], n: Int): Unit =
    require(exprs.length == n,
      s"$name expects $n argument(s), got ${exprs.length}")

  def register(s: SparkSession): Unit = {
    def fn(name: String, arity: Int)(b: Seq[Expression] => Expression): Unit =
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, { exprs => requireArity(name, exprs, arity); b(exprs) },
        "built-in")
    fn("graft_dot", 2)(exprs => DotProduct(exprs(0), exprs(1)))
    // graft_ngrams checks its own arity inside fromExprs
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams", NgramHash.fromExprs, "built-in")
    fn("graft_hash60", 1)(exprs => Hash60(exprs(0)))
    // arity + literal width checked inside fromExprs
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngram_h60", NgramHash60.fromExprs, "built-in")
    fn("graft_bloom_agg", 3)(exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2)))
    fn("graft_bloom_contains", 2)(exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1)))
  }
}
