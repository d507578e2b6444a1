package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Per-operator unit tests over tiny in-memory frames — the Spark
  * rendering of the reference's rackunit suites (chunk-list.rkt:20-37,
  * hash.rkt:73-165) plus bounds/shape checks the oracle can't express. */
class OperatorSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  import s.implicits._

  test("approx_count_distinct within 3×rsd of exact (q_agg_approx claim)") {
    val rsd = 0.02
    val df = Tables.lineitem(s, SparkTestBase.sfDir)
    val rows = df.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact"),
        approx_count_distinct($"l_partkey", rsd).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact <= 3 * rsd,
        s"flag=${r.get(0)}: approx=$approx exact=$exact")
    }
  }

  test("hll sketch merge: per-type and merged-total estimates track exact") {
    val rows = SparkEntry.queries("q_agg_sketch_merge")(s, SparkTestBase.sfDir)
      .collect()
    assert(rows.map(_.getAs[String]("scope")).contains("TOTAL"))
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Long]("n_est").toDouble
      // default lgConfigK=12 → rse ~1.04/sqrt(2^12) ≈ 1.6%; allow 3×
      assert(math.abs(est - exact) / exact <= 0.05,
        s"${r.get(0)}: est=$est exact=$exact")
    }
    // the TOTAL row's estimate came from MERGING the per-type sketches;
    // it must cover the union cardinality, not the sum of per-type ones
    val total = rows.find(_.getAs[String]("scope") == "TOTAL").get
    val sumTypes = rows.filter(_.getAs[String]("scope") != "TOTAL")
      .map(_.getAs[Long]("n_exact")).sum
    assert(total.getAs[Long]("n_exact") <= sumTypes,
      "union <= sum of parts (users appear under several types)")
  }

  test("as-of join picks the latest click at-or-before each purchase") {
    val clicks = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 50L, 102L))
      .toDF("user_id", "t", "click_id")
    val buys = Seq((1L, 15L, 900L), (1L, 20L, 901L), (2L, 40L, 902L))
      .toDF("user_id", "t", "buy_id")
    // same union+window formulation as q_join_asof (Relational.scala)
    val u = clicks.select($"user_id", $"t", lit(0).as("side"),
        lit(null).cast("long").as("buy_id"), $"click_id")
      .unionByName(buys.select($"user_id", $"t", lit(1).as("side"),
        $"buy_id", lit(null).cast("long").as("click_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"t", $"side")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val out = u
      .withColumn("last_click",
        last(when($"side" === 0, $"click_id"), ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"buy_id", $"last_click")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(900L -> 100L, // t=15: click@10
      901L -> 101L,                 // t=20: click@20 ties, "<=" wins
      902L -> -1L))                 // t=40: no click yet → null
  }

  test("property: repartition preserves the multiset (chunk-list.rkt:20-37)") {
    // The reference asserts its chunker loses nothing across remainder
    // shapes (12/3, 13/3, 3/3, 7/3); Spark's round-robin repartition
    // carries the same contract.
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(-1000, 1000))
      k <- Gen.chooseNum(1, 5)
    } yield (xs, k)
    val p = Prop.forAll(gen) { case (xs, k) =>
      xs.isEmpty || {
        val df = xs.toDF("x")
        df.repartition(k).collect().map(_.getInt(0)).sorted
          .sameElements(xs.sorted)
      }
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
      .passed)
  }

  test("minhash LSH candidates include a planted near-duplicate pair") {
    val base = "spark native analytics engine for large scale data processing pipelines with declarative plans"
    val near = base.replace("declarative", "optimized")
    val docs = Seq((1L, base), (2L, near),
      (3L, "completely different words entirely unrelated content about cooking recipes and gardens"))
      .toDF("doc_id", "text")
    val w = split($"text", " ")
    val sh = docs.select($"doc_id",
      array_distinct(transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1),
          element_at(w, i + 2)))).as("g"))
    val sig = sh.select($"doc_id",
      array_min(transform($"g", x => xxhash64(lit(0), x))).as("mh"))
    val cand = sig.as("a").join(sig.as("b"),
        $"a.mh" === $"b.mh" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").collect()
    // docs 1,2 share most shingles → same minhash with high probability
    // (deterministic given fixed seed/data); doc 3 shares nothing.
    assert(cand.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("events table: ts is post-epoch (Tables.events DIV-floor contract)") {
    val n = Tables.events(s, SparkTestBase.sfDir)
      .filter(unix_timestamp($"ts") <= 0).count()
    assert(n == 0)
  }

  test("entropy is bounded by ln(distinct chars) and lengths reconcile") {
    val e = SparkEntry.queries("q_llm_entropy")(s, SparkTestBase.sfDir)
    val docs = Tables.documents(s, SparkTestBase.sfDir)
      .select($"doc_id", length($"text").cast("long").as("txt_len"))
    val j = e.join(docs, "doc_id")
    assert(j.filter($"len_chars" =!= $"txt_len").count() == 0,
      "char histogram mass equals code-point length")
    // 0 ≤ H ≤ ln(k), with equality at the uniform distribution
    assert(j.filter($"entropy_nats" < 0 ||
      $"entropy_nats" > log($"n_distinct") + 1e-6).count() == 0)
    assert(j.filter($"top_char_frac" * $"n_distinct" < 1 - 1e-9).count() == 0,
      "max frequency at least the uniform share")
  }

  test("gap fill leaves no holes: grid dense, fill total, observed intact") {
    val g = SparkEntry.queries("q_ts_gapfill")(s, SparkTestBase.sfDir)
    assert(g.filter($"ff_val".isNull).count() == 0,
      "forward fill covers every grid row (spine starts at first datum)")
    assert(g.filter($"n_events" > 0 && !($"avg_val" === $"ff_val"))
      .count() == 0, "observed rows keep their own value")
    assert(g.filter($"n_events" === 0 && $"avg_val".isNotNull).count() == 0)
    // the hour grid is gapless: per series, rows == span/1h + 1
    val dense = g.groupBy($"event_type")
      .agg(count(lit(1)).as("rows"),
        ((max($"hour_us") - min($"hour_us")) / 3600000000L + 1).as("want"))
      .filter($"rows" =!= $"want").count()
    assert(dense == 0)
  }

  test("merge upsert: actions partition the key space as derived") {
    val m = SparkEntry.queries("q_merge_upsert")(s, SparkTestBase.sfDir)
    val base = Tables.orders(s, SparkTestBase.sfDir)
    val n = base.count()
    val byAction = m.groupBy($"action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val updates = base.filter($"o_orderkey" % 10 === 0).count()
    val inserts = base.filter($"o_orderkey" % 100 === 0).count()
    assert(byAction("update") == updates)
    assert(byAction("insert") == inserts)
    assert(byAction("keep") == n - updates)
    // inserted keys live past the base key space with the batch price
    assert(m.filter($"action" === "insert" &&
      ($"key" < 10000000L || !($"price" === 42.42))).count() == 0)
  }
}
