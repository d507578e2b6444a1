package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the training-set assembly operators that the
  * row-hash oracle can't express directly. */
class LlmTrainSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val sf = SparkTestBase.sfDir

  test("bloom decontamination output is IDENTICAL to the exact pass") {
    // the bloom is a pre-filter with no false negatives; the residual
    // exact join removes its false positives — same rows, same counts
    val exact = SparkEntry.queries("q_llm_decontaminate")(s, sf)
      .collect().toSeq
    val bloom = SparkEntry.queries("q_llm_decontaminate_bloom")(s, sf)
      .collect().toSeq
    assert(exact.nonEmpty && exact == bloom)
  }

  test("pack conserves documents and tokens, chunks start within bound") {
    val docs = SparkEntry.queries("q_llm_pack")(s, sf)
    val tot = docs.agg(sum("n_docs").as("d"), sum("chunk_tokens").as("t"))
      .collect()(0)
    val base = s.read.parquet(s"$sf/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(count(lit(1)), sum(col("n"))).collect()(0)
    assert(tot.getLong(0) == base.getLong(0), "every doc packed exactly once")
    assert(tot.getLong(1) == base.getLong(1), "every token packed exactly once")
    // chunk ids are dense per (lang, shard): max chunk < ceil(total/2048)
    val bad = docs.groupBy(col("lang"), col("shard"))
      .agg(max(col("chunk")).as("mx"), sum(col("chunk_tokens")).as("st"))
      .filter(col("mx") > ceil(col("st") / 2048))
      .count()
    assert(bad == 0)
  }

  test("kmeans step assigns every vector exactly once") {
    val m = SparkEntry.queries("q_llm_kmeans")(s, sf)
    val assigned = m.agg(sum("n_vecs")).collect()(0).getLong(0)
    val vecs = s.read.parquet(s"$sf/embeddings.parquet").count()
    assert(assigned == vecs)
    // distances are squared L2 — never negative
    assert(m.filter(col("avg_d2") < 0).count() == 0)
  }

  test("chunking covers every token with the stride/size geometry") {
    val c = SparkEntry.queries("q_llm_chunk")(s, sf)
      .select(col("doc_id"), col("chunk_idx"), col("strt"), col("chunk_len"))
    val docs = s.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val j = c.join(docs, "doc_id")
    // chunk length is exactly min(ChunkSize, n - strt)
    assert(j.filter(col("chunk_len") =!=
      least(lit(32L), col("n") - col("strt"))).count() == 0)
    // starts are the exact stride lattice: idx*24, last start < n
    assert(j.filter(col("strt") =!= col("chunk_idx") * 24).count() == 0)
    assert(j.filter(col("strt") >= col("n")).count() == 0)
    // every doc chunked; last chunk reaches the end of the doc
    val perDoc = j.groupBy(col("doc_id"), col("n"))
      .agg(max(col("strt") + col("chunk_len")).as("covered"))
    assert(perDoc.filter(col("covered") =!= col("n")).count() == 0)
    assert(perDoc.count() == docs.count())
  }

  test("mixture weights are a distribution and temperature up-samples tails") {
    val m = SparkEntry.queries("q_llm_mixture")(s, sf).collect()
    val sw = m.map(_.getAs[Double]("samp_weight")).sum
    assert(math.abs(sw - 1.0) < 1e-3, s"weights sum to 1, got $sw")
    // α < 1 ⇒ smallest language gets boost > 1, largest < 1 (or all
    // equal-sized); on this corpus langs are unbalanced enough
    val byN = m.sortBy(_.getAs[Long]("n_docs"))
    assert(byN.head.getAs[Double]("boost") >=
      byN.last.getAs[Double]("boost"))
  }

  test("pagerank iteration conserves mass over the dup graph") {
    val r = SparkEntry.queries("q_graph_pagerank")(s, SparkTestBase.sfDir)
      .collect()
    val cc = SparkEntry.queries("q_llm_dedup_cc")(s, SparkTestBase.sfDir)
      .collect()
    // same node set as the CC clustering of the same edges
    assert(r.map(_.getAs[Long]("doc_id")).toSet ==
      cc.map(_.getAs[Long]("doc_id")).toSet)
    if (r.nonEmpty) {
      val ranks = r.map(_.getAs[Double]("rank"))
      assert(ranks.forall(_ > 0.0))
      // no dangling nodes (undirected graph) ⇒ one iteration keeps
      // total mass at exactly 1 (up to the r6 output rounding)
      assert(math.abs(ranks.sum - 1.0) < 1e-4 * ranks.length,
        s"rank mass ${ranks.sum} != 1")
    }
  }

  test("keeper is its cluster's top-ranked member, geometry consistent") {
    val keep = SparkEntry.queries("q_llm_keeper")(s, SparkTestBase.sfDir)
      .collect()
    val cc = SparkEntry.queries("q_llm_dedup_cc")(s, SparkTestBase.sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("cluster_size"))).toMap
    val pr = SparkEntry.queries("q_graph_pagerank")(s, SparkTestBase.sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rank")).toMap
    assert(keep.length == cc.values.map(_._1).toSet.size,
      "one keeper per cluster")
    keep.foreach { k =>
      val (cl, doc) = (k.getAs[Long]("cluster"), k.getAs[Long]("keeper_doc"))
      assert(cc(doc)._1 == cl, "keeper belongs to its cluster")
      assert(cc(doc)._2 == k.getAs[Long]("n_members"))
      val clusterRanks = cc.collect {
        case (d, (c, _)) if c == cl => pr(d)
      }
      // tolerance, not exact equality: the two ranks come from
      // independent PageRank executions whose float sums can
      // accumulate in different orders, and a raw value on an r6
      // rounding boundary would flip the last digit
      assert(math.abs(k.getAs[Double]("keeper_rank") - clusterRanks.max)
        <= 1e-6, "keeper carries the cluster's max rank")
    }
  }
}
