package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Memory-ceiling evidence for the constant-state aggregation claim
  * (verdict r10 #8): the repo's core scale argument is that the
  * order-statistics family (percentile / trimmed / mad — two-phase
  * range-split ranking, no value buffering) and the dedup family
  * (distinct-class banding, bounded buckets) hold an executor memory
  * contract that value-buffering engines break at scale. This harness
  * runs them INSIDE an artificially small heap (launch with -Xmx2g;
  * the JVM's real ceiling is recorded in the output) at a large SF
  * and reports, per query: wall seconds, result rows, and the
  * shuffle-spill bytes Spark's stage metrics observed — completion
  * under the ceiling is the claim; spill > 0 shows the ceiling was
  * actually felt (execution memory exhausted → graceful spill, not
  * OOM).
  *
  * Usage:
  *   java -Xmx2g -cp 'target/scala-2.13/classes:/opt/spark/jars/&#42;'
  *     [--add-opens ...] graft.PressureBench /tmp/graft-sf3 [query...]
  *
  * One JSON line out (the Bench contract); recorded in SCALE.md. */
object PressureBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf3")
    val queries =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_agg_percentile", "q_agg_trimmed", "q_agg_mad",
        "q_llm_dedup_fuzzy", "q_llm_dedup_ngram", "q_llm_dedup_simhash",
        // the three largest genuine shuffles outside the aggregate
        // family (verdict r12 #6): PPJoin bucket join, session window
        // sort, triangle wedge join
        "q_win_sessionize", "q_graph_triangles")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // spill observed from stage metrics — the graceful-degradation
    // signal (memory+disk both count; memoryBytesSpilled is the
    // in-memory size of data that had to leave execution memory)
    val spilled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null)
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })

    def q(s: String): String = "\"" + s + "\""
    // listener events are delivered asynchronously on the bus — drain
    // it before each before/after sample or spill attributes to the
    // wrong query (and the last query's spill is missed entirely)
    def drainedSpill(): Long = {
      org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(spark.sparkContext)
      spilled.get()
    }
    val results = queries.map { name =>
      // release the previous query's staged checkpoint blocks first —
      // pinned MEMORY_AND_DISK blocks would shrink the constrained
      // heap for later queries and cross-contaminate the per-query
      // spill numbers (review r13)
      ops.Staged.sweep()
      System.gc()
      val before = drainedSpill()
      val t0 = System.nanoTime()
      // toRdd executes EVERY operator in the plan (a bare .count()
      // lets Catalyst prune unreferenced projections — q_win_sessionize
      // would lose its window sort and the pressure claim with it)
      val rows = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val sp = drainedSpill() - before
      System.err.println(f"[pressure] $name: $sec%.2fs rows=$rows spill=$sp")
      (name, sec, rows, sp)
    }
    val heap = Runtime.getRuntime.maxMemory()
    println(
      s"""{"metric":"pressure_total","value":${results.map(_._2).sum},""" +
      s""""unit":"sec","heapBytes":$heap,"cpus":$cpus,"sf":${q(sfDir)},""" +
      s""""queries":{${results.map(r => s"${q(r._1)}:${r._2}").mkString(",")}},""" +
      s""""rows":{${results.map(r => s"${q(r._1)}:${r._3}").mkString(",")}},""" +
      s""""spillBytes":{${results.map(r => s"${q(r._1)}:${r._4}").mkString(",")}}}""")
    spark.stop()
  }
}
