package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The deployment entry point for graft's engine extensions: the TopK
  * rewrite rule + physical strategy (plans/TopK.scala) and the native
  * `graft_dot` expression (functions/DotProduct.scala), injected the
  * way a cluster rollout would configure them:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Verify/Bench/tests build their sessions with exactly this config,
  * so the scored path IS the deployment path. `TopK.install` /
  * `GraftFunctions.register` remain as per-session equivalents for
  * sessions built without the conf (both are idempotent; a session
  * with the conf AND the calls behaves identically). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.TopK.TopKRewrite)
    e.injectPlannerStrategy(_ => graft.plans.TopK.TopKStrategy)
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName,
        "graft_dot"),
      (exprs: Seq[Expression]) =>
        graft.functions.DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[graft.functions.NgramHash].getName,
        "graft_ngrams"),
      (exprs: Seq[Expression]) => graft.functions.NgramHash.fromExprs(exprs)))
    // Spark ships bloom-filter build/probe as INTERNAL expressions
    // (used by its own runtime join filters, not in the public
    // registry); expose them as first-class pipeline functions — the
    // Dolma-style decontamination pre-filter needs exactly this pair.
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate",
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain",
        "graft_bloom_contains"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))))
  }
}
