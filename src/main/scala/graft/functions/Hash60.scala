package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression for the portable 60-bit key hash the
  * deterministic-sampling family keys on. Semantically IDENTICAL to
  * the composable formulation
  * `conv(substring(md5(x), 1, 15), 16, 10)::LONG` — the first 15 hex
  * digits of an MD5 are its top 60 bits — but computed straight from
  * the digest bytes: the composable chain materializes a 32-char hex
  * string and re-parses 15 chars of it PER ROW (per GRAM in
  * q_llm_dsir_weight), all to recover bits the digest already held.
  * 60 bits < 63 keeps the value non-negative, so `% n` bucketing and
  * `< p` thresholding behave identically in Spark and in the DuckDB
  * oracles, which deliberately KEEP the string formulation — the two
  * engines now agree through entirely different code paths, which
  * strengthens the oracle rather than weakening it.
  *
  * Registered per-session under `graft_hash60` via
  * [[GraftFunctions.register]].
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_hash60 requires a STRING argument, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override def nullSafeEval(v: Any): Any =
    Hash60.hash(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")

  override protected def withNewChildInternal(c: Expression): Hash60 =
    copy(child = c)
}

object Hash60 {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(utf8 bytes): bytes 0–6 whole plus the high
    * nibble of byte 7 — exactly the value `conv(substring(hex, 1, 15),
    * 16, 10)` parses from the hex rendering. */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (dig(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}
