package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_graph_triangles' class contraction (the round-11 extension
  * of the CC/keeper contraction to the triangle/degree diagnostic):
  * per-member degree and triangle counts are computed from class
  * algebra over the distinct-fingerprint graph, never by wedge-
  * joining expanded member edges. The ground truth is brute-force
  * triangle counting over the scored EXPANDED pair list
  * (q_llm_dedup_simhash — whose own pair-set-under-duplication
  * identity SimhashDupSpec/DedupCollapseSpec pin), on a 5-way
  * verbatim-duplicated corpus where every fingerprint class is a
  * 5·m-clique and the contraction's every term (intra-clique,
  * clique×neighbour, within-neighbour, class-triangle) is exercised
  * with multiplicities > 1. */
class TriangleCollapseSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d0 = SparkTestBase.sfDir
  private val dup = 5

  private def dupDocs(): String = {
    val t = Tables.documents(s, d0)
    val stride = t.agg(max(col("doc_id"))).head.getLong(0) + 1
    val dir = Scratch.dir("tri-collapse")
    (0 until dup).map(c =>
        t.withColumn("doc_id", col("doc_id") + lit(c * stride)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("per-node degree and triangle counts equal brute force over " +
      "the expanded pair list under 5-way duplication") {
    val dir = dupDocs()
    val edges = SparkEntry.queries("q_llm_dedup_simhash")(s, dir)
      .select(col("da"), col("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "the duplicated corpus must have dup pairs")
    // brute force: adjacency sets, count triangles per node
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for ((a, b) <- edges) { adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    val expected = adj.keys.toSeq.flatMap { v =>
      val nb = adj(v).toSeq
      val tri = (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if adj(nb(i)).contains(nb(j))
      } yield 1).size.toLong
      if (tri >= 1) Some(v -> ((adj(v).size.toLong, tri))) else None
    }.toMap
    assert(expected.nonEmpty, "the clique structure must form triangles")
    val got = SparkEntry.queries("q_graph_triangles")(s, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles")))).toMap
    assert(got == expected,
      s"contracted counts must equal brute force: got ${got.size} nodes," +
        s" expected ${expected.size}")
  }

  test("property: generic triangleCountsOver equals brute force on " +
      "random multigraphs with self-loops") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import s.implicits._
    val graphGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(2, 12)
      m <- Gen.chooseNum(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong)) // any orientation, dups, self-loops
    } yield es
    val prop = Prop.forAll(graphGen) { es =>
      val simple = es.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val adj = simple.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
      val expected = adj.map { case (v, nb) =>
        val ns = nb.toSeq
        v -> ((nb.size.toLong, (for {
          i <- ns.indices; j <- (i + 1) until ns.size
          if adj(ns(i)).contains(ns(j))
        } yield 1).size.toLong))
      }
      val got = graft.ops.LlmPipe.triangleCountsOver(es.toDF("x", "y"))
        .collect()
        .map(r => r.getAs[Long]("node") ->
          ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles")))).toMap
      got == expected
    }
    val r = check(Parameters.default.withMinSuccessfulTests(12), prop)
    assert(r.passed, r.status.toString)
  }
}
