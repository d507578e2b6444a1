package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** q_llm_kmeans' r15 assignment rewrite must be result-identical to
  * the crossJoin + min-agg form it replaced: the per-row
  * array_min(transform(cbook, struct(d2, clabel))) fold and the old
  * min(struct(d2, clabel)) aggregation use the same field-wise struct
  * ordering (d2 first, clabel tie-break) over the same d2 arithmetic
  * (graft_dot expansion, identical op order), so the reassignment
  * matrix — counts AND r6-discretized mean distances — must match
  * row for row. Exercised over random low-dim embeddings including
  * duplicated vectors (forced d2 ties across labels). */
class KmeansArgminSpec extends AnyFunSuite {
  private def s = SparkTestBase.spark

  /** Old formulation, verbatim from the pre-r15 kmeansStep. */
  private def stepOld(emb: DataFrame, cent: DataFrame): DataFrame = {
    val d2 = expr(
      "graft_dot(e, e) - 2 * graft_dot(e, cv) + graft_dot(cv, cv)")
    emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("clabel"), d2.as("d2"))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(struct(col("d2"), col("clabel"))).as("best"))
      .groupBy(col("label"), col("best.clabel").as("assigned"))
      .agg(count(lit(1)).as("n_vecs"),
        graft.ops.Det.r6(avg(col("best.d2"))).as("avg_d2"))
      .orderBy(col("label"), col("assigned"))
  }

  /** New formulation, matching LlmTrain.kmeansStep. */
  private def stepNew(emb: DataFrame, cent: DataFrame): DataFrame = {
    val packed = cent.coalesce(1)
      .agg(array_sort(collect_list(struct(col("clabel"), col("cv"))))
        .as("cbook"))
    val d2cells = transform(col("cbook"), x => struct(
      (call_function("graft_dot", col("e"), col("e"))
        - lit(2) * call_function("graft_dot", col("e"), x.getField("cv"))
        + call_function("graft_dot", x.getField("cv"), x.getField("cv")))
        .as("d2"),
      x.getField("clabel").as("clabel")))
    emb.crossJoin(broadcast(packed))
      .select(col("label"), array_min(d2cells).as("best"))
      .groupBy(col("label"), col("best.clabel").as("assigned"))
      .agg(count(lit(1)).as("n_vecs"),
        graft.ops.Det.r6(avg(col("best.d2"))).as("avg_d2"))
      .orderBy(col("label"), col("assigned"))
  }

  test("argmin fold equals the crossJoin + min-agg assignment") {
    graft.functions.GraftFunctions.register(s)
    val spark = s
    import spark.implicits._
    val dim = 4
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-5, 5).map(_.toDouble))
    val p = Prop.forAll(
      Gen.nonEmptyListOf(vecGen).map(_.take(40)),
      Gen.chooseNum(1, 5)) { (vs, nLabels) =>
      // duplicated vectors across labels force exact d2 ties so the
      // clabel tie-break is exercised, not just assumed
      val rows = (vs ++ vs.take(5)).zipWithIndex.map { case (v, i) =>
        (i.toLong, (i % nLabels).toLong, v)
      }
      val emb = rows.toDF("vec_id", "label", "e")
      val cent = emb.select(col("label").as("clabel"), posexplode(col("e")))
        .groupBy(col("clabel"), col("pos"))
        .agg(graft.ops.Det.r6(avg(col("col"))).as("m"))
        .groupBy(col("clabel"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          _.getField("m")).as("cv"))
      val o = stepOld(emb, cent).collect().map(_.toSeq).toSeq
      val n = stepNew(emb, cent).collect().map(_.toSeq).toSeq
      val ok = o == n
      if (!ok) println(s"kmeans argmin mismatch:\nold=$o\nnew=$n")
      ok
    }
    val r = check(Parameters.default.withMinSuccessfulTests(6), p)
    assert(r.passed, r.status.toString)
  }
}
