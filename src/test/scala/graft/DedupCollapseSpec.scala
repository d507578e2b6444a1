package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the collapse-then-expand restructure of the three
  * similarity-dedup queries that verify candidates pairwise
  * (q_llm_dedup_fuzzy, q_llm_dedup_ngram, q_llm_dedup_embed — the
  * round-9 extension of round 8's SimhashDupSpec): blocking and
  * verification run over DISTINCT content classes and member pairs
  * are re-expanded afterwards, so a verbatim-duplicated corpus (the
  * sf1 harness, or any crawl snapshot) cannot inflate the verified
  * pair count quadratically. The output under d-way duplication must
  * be EXACTLY the algebraic expansion of the original corpus's pairs:
  *
  *   dup(d) pairs =  { (x_i, x_j), sim = 1  | x ∈ docs, i < j }   (intra-class)
  *                ∪  { (a_i, b_j), sim      | (a, b, sim) ∈ orig, ∀ i, j }
  *
  * where x_c = x + c·stride. Similarities depend only on content, so
  * every copy reproduces its source's pair similarities; the intra
  * branch applies only to content that PRODUCES features (≥ 3/4
  * tokens for the shingle/gram dedups — featureless docs pair with
  * nothing on either engine). */
class DedupCollapseSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d0 = SparkTestBase.sfDir
  private val dup = 5

  /** d-way duplicate one table into a scratch dir, shifting the id
    * column by c·stride per copy; returns (dir, orig ids, stride). */
  private def dupTable(table: String, idCol: String, kind: String)
      : (String, Array[Long], Long) = {
    val t = Tables.t(s, d0, table)
    val stride = t.agg(max(col(idCol))).head.getLong(0) + 1
    val dir = Scratch.dir(kind)
    (0 until dup).map(c =>
        t.withColumn(idCol, col(idCol) + lit(c * stride)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/$table.parquet")
    val ids = t.select(col(idCol)).collect().map(_.getLong(0))
    (dir, ids, stride)
  }

  /** The expected pair set: intra-class C(d,2) per feature-bearing id
    * + d² copies of every original pair, ids least/greatest-ordered. */
  private def expected(orig: Seq[(Long, Long, Double)],
                       featured: Seq[Long], stride: Long)
      : Set[(Long, Long, Double)] = {
    val intra = for {
      x <- featured; i <- 0 until dup; j <- (i + 1) until dup
    } yield (x + i * stride, x + j * stride, 1.0)
    val cross = for {
      (a, b, sim) <- orig; i <- 0 until dup; j <- 0 until dup
      (ai, bj) = (a + i * stride, b + j * stride)
    } yield (math.min(ai, bj), math.max(ai, bj), sim)
    (intra ++ cross).toSet
  }

  private def pairs3(q: String, dir: String): Array[(Long, Long, Double)] =
    SparkEntry.queries(q)(s, dir)
      .select(col("da"), col("db"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  for (q <- Seq("q_llm_dedup_fuzzy", "q_llm_dedup_ngram")) {
    val minTokens = if (q.endsWith("fuzzy")) 3 else 4
    test(s"$q: pair set under $dup-way duplication is the exact expansion") {
      val orig = pairs3(q, d0)
      assert(orig.nonEmpty, "fixture corpus must contain near-dup pairs")
      val (dir, _, stride) = dupTable("documents", "doc_id",
        s"dupc-${q.takeRight(5)}")
      val featured = Tables.documents(s, d0)
        .filter(size(split(col("text"), " ")) >= minTokens)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      val got = pairs3(q, dir)
      assert(got.length == got.toSet.size, "no duplicate pairs emitted")
      assert(got.toSet == expected(orig.toSeq, featured, stride),
        s"pair set must be the exact d²/C(d,2) expansion: " +
          s"got ${got.length}, expected ${
            expected(orig.toSeq, featured, stride).size}")
    }
  }

  test("q_llm_dedup_embed: pair set under duplication is the exact expansion") {
    val q = "q_llm_dedup_embed"
    def pairsE(dir: String) = SparkEntry.queries(q)(s, dir)
      .select(col("va"), col("vb"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val orig = pairsE(d0)
    assert(orig.nonEmpty, "fixture corpus must contain near-dup vectors")
    val (dir, ids, stride) = dupTable("embeddings", "vec_id", "dupc-embed")
    // every vector is featured (cells are total); self-cosine is 1.0
    // under the r4 grid (|1 − dot/(√dot·√dot)| ≲ 1e-15 ≪ 5e-5)
    val got = pairsE(dir)
    assert(got.length == got.toSet.size, "no duplicate pairs emitted")
    assert(got.toSet == expected(orig.toSeq, ids.toSeq, stride),
      s"pair set must be the exact expansion: got ${got.length}, " +
        s"expected ${expected(orig.toSeq, ids.toSeq, stride).size}")
  }
}
