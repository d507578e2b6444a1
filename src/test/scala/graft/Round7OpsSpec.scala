package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-7 operator invariants the hash gate can't see. */
class Round7OpsSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  import s.implicits._

  test("llm_dedup_url: canonical forms are clean, docs conserved, merging real") {
    val q = SparkEntry.queries("q_llm_dedup_url")(s, SparkTestBase.sfDir)
      .collect()
    assert(q.nonEmpty)
    val canon = q.map(_.getAs[String]("canonical_url"))
    // the canonicalization chain's whole point: no tracking params, no
    // fragments, no www alias, no trailing-slash variants survive
    canon.foreach { u =>
      assert(!u.contains("utm_"), s"tracking param survived: $u")
      assert(!u.contains("#"), s"fragment survived: $u")
      assert(!u.contains("://www."), s"www alias survived: $u")
      assert(!u.endsWith("/"), s"trailing slash survived: $u")
      assert(u.startsWith("https://site"), s"unexpected shape: $u")
    }
    // real (non-tracking) query params must SURVIVE canonicalization
    assert(canon.exists(_.contains("?page=2")), "page param kept")
    // every document lands in exactly one canonical group
    val total = q.map(_.getAs[Long]("n_docs")).sum
    val nDocs = Tables.documents(s, SparkTestBase.sfDir).count()
    assert(total == nDocs, "every doc in exactly one URL group")
    // canonicalization merged genuinely different raw strings somewhere
    assert(q.exists(_.getAs[Long]("n_raw_forms") > 1),
      "variant noise merged by the chain")
    // keeper is a member: keeper_doc's own URL canonicalizes to the group
    q.foreach { r =>
      assert(r.getAs[Long]("keeper_doc") >= 0)
      assert(r.getAs[Long]("n_raw_forms") <= r.getAs[Long]("n_docs"))
    }
  }

  test("llm_dedup_url: canonicalization is idempotent on its own output") {
    // a non-idempotent canonicalizer splits groups on incremental
    // re-crawls, where stored keys are already canonical
    val canon = SparkEntry.queries("q_llm_dedup_url")(s, SparkTestBase.sfDir)
      .select($"canonical_url")
    val twice = canon.select($"canonical_url",
      graft.ops.LlmQuality.canonicalizeUrl($"canonical_url").as("again"))
      .filter($"canonical_url" =!= $"again")
    assert(twice.isEmpty, "canon(canon(u)) must equal canon(u)")
  }
}
