package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_llm_semdedup's class contraction: pair decisions are made
  * once per DISTINCT embedding class and re-expanded to members, so
  * a verbatim-duplicated corpus cannot inflate the in-cell self-join
  * quadratically. The reference is the expanded per-member
  * formulation the contraction replaced
  * ([[ops.LlmExt.semdedupExpandedOver]], spec-only), asserted
  * output-equal:
  *   1. on the fixture embeddings 5-way duplicated (every class
  *      multiplicity ≥ 5 — intra-class drop-all-but-min and
  *      cross-class wholesale drops both exercised);
  *   2. on a hand-built frame that FORCES the cross-class tie branch
  *      (two distinct equal-norm vectors symmetric about their cell
  *      centroid ⇒ identical r6 cos_centroid, pairwise cosine above
  *      the 0.35 near-dup cut ⇒ the drop rule falls through to the
  *      pairwise greatest-id tie-break, whose contraction is the
  *      id > min(other class) predicate). */
class SemdedupCollapseSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d0 = SparkTestBase.sfDir
  private val dup = 5

  private def collect(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
      r.getAs[Double]("cos_centroid"))).toSeq.sorted

  test("drop set equals the expanded formulation under 5-way duplication") {
    val t = Tables.embeddings(s, d0)
    val stride = t.agg(max(col("vec_id"))).head.getLong(0) + 1
    val e0 = (0 until dup).map(c =>
        t.withColumn("vec_id", col("vec_id") + lit(c * stride)))
      .reduce(_ unionByName _)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val got = collect(ops.LlmExt.semdedupOver(e0))
    val ref = collect(ops.LlmExt.semdedupExpandedOver(e0))
    assert(ref.nonEmpty, "the duplicated corpus must drop members")
    assert(got == ref,
      s"contracted drop set must equal expanded: got ${got.size}, " +
        s"expected ${ref.size}")
  }

  test("cross-class cos_centroid tie falls to the greatest-id rule, " +
      "contracted as id > min(other class)") {
    import s.implicits._
    // two distinct classes with members {1,4} and {2,3}: vectors
    // (1, 0.5, 0.25, 0…) and (1, 0.25, 0.5, 0…) — shared argmax dim
    // ⇒ same grid cell; dims-2/3-swap symmetry with EXACTLY
    // representable components (powers of two ⇒ every sum/mean exact)
    // gives bit-identical cos_centroid; cosine(a, b) = 1.25/1.3125
    // ≈ 0.95 ≥ 0.35. Expected drops under the pairwise rule: pairs
    // (1,2),(1,3),(2,4),(3,4) drop the max ⇒ {2,3,4} dropped, 1 (the
    // global min) kept.
    val va = Array(1.0, 0.5, 0.25) ++ Array.fill(61)(0.0)
    val vb = Array(1.0, 0.25, 0.5) ++ Array.fill(61)(0.0)
    val e0 = Seq((1L, va), (4L, va), (2L, vb), (3L, vb))
      .toDF("vec_id", "e")
    val got = collect(ops.LlmExt.semdedupOver(e0))
    val ref = collect(ops.LlmExt.semdedupExpandedOver(e0))
    assert(got == ref, s"tie branch must match expanded: $got vs $ref")
    val cells = got.map(_._2).distinct
    if (cells.size == 1) {
      // same cell: the tie branch actually fired — pin the exact set
      assert(got.map(_._1).toSet == Set(2L, 3L, 4L),
        s"tie drop set must be {2,3,4}: $got")
      val ccs = got.map(_._3).distinct
      assert(ccs.size == 1, s"tie requires equal cos_centroid: $ccs")
    } else fail(s"tie fixture must land in one cell, got cells $cells")
  }
}
