package graft


import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k operator must be a drop-in for the declarative
  * row_number formulation: same rows, same ranks, with the partial
  * prune visible in the physical plan. */
class TopKSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  private def topkQuery() = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  test("rewrite fires via spark.sql.extensions config (no install call)") {
    // SparkTestBase sets spark.sql.extensions=graft.GraftExtensions;
    // nothing in this suite calls TopK.install — the plan shape below
    // proves the config-driven injection path works end to end
    val str = topkQuery().queryExecution.executedPlan.toString
    assert(str.contains("PartialTopK"), s"expected PartialTopK in:\n$str")
    assert(str.contains("FinalTopK"))
    // the builtin WindowGroupLimit pre-prune must be subsumed, and the
    // window machinery gone entirely
    assert(!str.contains("WindowGroupLimit"))
    assert(!str.contains("RunningWindowFunction") && !str.contains("Window ["))
  }

  test("scored q_topk_per_group fires PartialTopK on a conf-only session " +
      "(verdict r11 #7)") {
    // a genuinely fresh session: newSession() rebuilds SessionState
    // (function registry, experimental rules/strategies) from nothing
    // but the spark.sql.extensions conf — no TopK.install, no
    // GraftFunctions.register has touched it. The SCORED registry
    // query must plan through the injected rule + strategy, and the
    // injected native function must resolve by name, exactly as a
    // cluster rollout with only the --conf line would see it.
    val fresh = s.newSession()
    val plan = SparkEntry.queries("q_topk_per_group")(fresh, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK") && plan.contains("FinalTopK"),
      s"conf-only session did not plan the custom operator:\n$plan")
    import fresh.implicits._
    val dot = fresh.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS v")
      .as[Double].head()
    assert(dot == 11.0, s"injected graft_dot returned $dot")
  }

  test("custom operator result equals the window formulation") {
    // baseline WITHOUT the rule: newSession inherits the injected
    // extensions, so exclude the rewrite by name for this session
    val plain = s.newSession()
    plain.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.TopK$TopKRewrite")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val baseline = Tables.orders(plain, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
    // guard against silent rule-name drift: excludedRules IGNORES
    // unknown names, which would turn this into TopK == TopK
    val baseStr = baseline.queryExecution.executedPlan.toString
    assert(!baseStr.contains("PartialTopK"),
      "exclusion did not take — update the rule name in excludedRules")
    val expected = baseline.collect().toSeq

    val got = topkQuery().collect().toSeq
    assert(got == expected)
  }

  test("rewrite leaves non-matching window queries untouched") {
    // rank() (not row_number) must NOT be rewritten
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(s, d)
      .withColumn("r", rank().over(w).cast("long"))
      .filter(col("r") <= 2)
    val str = df.queryExecution.executedPlan.toString
    assert(!str.contains("PartialTopK") && !str.contains("FinalTopK"))
    assert(df.count() > 0)
  }

  test("collect() works when the Filter has no Project above it") {
    // regression: FinalTopKExec must emit UnsafeRow — a bare
    // withColumn+filter+collect (no select) crashed with
    // ClassCastException before the UnsafeProjection wrap
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val rows = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect()
    assert(rows.nonEmpty)
  }

  test("negative or wrapping rank limits are not rewritten") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= lit(-4294967293L)) // low 32 bits == 3
    val str = df.queryExecution.executedPlan.toString
    assert(!str.contains("PartialTopK") && !str.contains("FinalTopK"))
    assert(df.count() == 0) // always-false predicate stays always-false
  }

  test("rn === 1 (top-row-per-group idiom) is rewritten; === 2 is not") {
    // rn === 1 is equivalent to rn <= 1 for row_number (ranks are dense
    // from 1) — the ubiquitous hub-pick shape must get the bounded heap
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val top1 = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"))
    val str1 = top1.queryExecution.executedPlan.toString
    assert(str1.contains("PartialTopK") && str1.contains("FinalTopK"),
      s"=== 1 not rewritten:\n$str1")

    // result must equal the un-rewritten formulation
    val plain = s.newSession()
    plain.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.TopK$TopKRewrite")
    val baseline = Tables.orders(plain, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"))
    assert(!baseline.queryExecution.executedPlan.toString.contains("PartialTopK"))
    assert(top1.collect().toSet == baseline.collect().toSet)

    // === k for k > 1 selects one rank, not a prefix — must NOT rewrite
    val eq2 = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 2)
    val str2 = eq2.queryExecution.executedPlan.toString
    assert(!str2.contains("PartialTopK") && !str2.contains("FinalTopK"))
    assert(eq2.count() > 0)
  }

  test("plain-rename alias of the rank column still fires the rewrite " +
      "(select($\"rn\".as(\"rank\")) — review r13)") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val q = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("rn").as("rank"))
      .filter(col("rank") <= 3)
    val str = q.queryExecution.executedPlan.toString
    assert(str.contains("FinalTopK"),
      s"rename-alias shape did not rewrite:\n$str")
    // and the result matches the builtin window path
    val plain = s.newSession()
    plain.experimental.extraOptimizations = Nil
    plain.experimental.extraStrategies = Nil
    val wp = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expect = Tables.orders(plain, d)
      .withColumn("rn", row_number().over(wp))
      .select(col("o_custkey"), col("o_orderkey"), col("rn").as("rank"))
      .filter(col("rank") <= 3)
      .collect().map(_.toString).sorted.toSeq
    assert(q.collect().map(_.toString).sorted.toSeq == expect)
  }

  test("FinalTopK group state SPILLS under memory pressure and stays " +
      "correct (review r13: reduce side must degrade, not OOM)") {
    // the high-cardinality regime in miniature: 600k rows / 200k
    // groups funneled into 4 reduce partitions blows past the
    // context-level numElementsForceSpillThreshold (100k — see
    // SparkTestBase), so each FinalTopK task MUST spill sorted runs
    // and merge-read them. Spill observed from stage metrics;
    // output checked row-for-row against the builtin window path.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val spilled = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null)
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled); ()
      }
    }
    // compared as a (count, order-independent content digest) pair —
    // collecting the 400k result rows themselves is flaky under a
    // shared block manager (indirect task-result blocks evict as
    // TaskResultLost when earlier suites left storage pressure)
    def synthetic(sess: org.apache.spark.sql.SparkSession) = {
      val w = Window.partitionBy(col("g"))
        .orderBy(col("v").desc, col("id"))
      sess.range(0, 600000).toDF("id")
        .withColumn("g", col("id") % 200000)
        .withColumn("v", (col("id") * 2654435761L) % 1000003L)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("g"), col("rn"), col("id"), col("v"))
    }
    def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      // hash bounded to ±1e9+7 per row so 400k-row sums stay far from
      // Long range (ANSI overflow would fail the sum)
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("g"), col("rn"), col("id"), col("v"))
          % lit(1000000007L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val q = synthetic(s)
    val str = q.queryExecution.executedPlan.toString
    assert(str.contains("FinalTopK"), s"rewrite did not fire:\n$str")
    s.sparkContext.addSparkListener(listener)
    val got = try {
      val r = digest(q)
      org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(s.sparkContext)
      r
    } finally s.sparkContext.removeSparkListener(listener)
    assert(spilled.get() > 0,
      "FinalTopK never spilled — the pressure path was not exercised")
    val plain = s.newSession()
    plain.experimental.extraOptimizations = Nil
    plain.experimental.extraStrategies = Nil
    val expect = digest(synthetic(plain))
    assert(got._1 == 400000L && got == expect,
      s"spilled FinalTopK diverged from the window path: $got vs $expect")
  }

  test("global top-k (empty partitionBy) is left to the builtin path") {
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
    val str = df.queryExecution.executedPlan.toString
    assert(!str.contains("PartialTopK") && !str.contains("FinalTopK"))
    assert(df.count() == 5) // and it still executes fine
  }
}
