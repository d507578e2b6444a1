package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (sessions are
  * expensive; suites only read). Mirrors the driver's session config:
  * UTC, small shuffle partitions, nanos-as-long for events.parquet. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      // same AQE shuffle-width rule as Verify/Bench (8× cores) — the
      // suite exercises the deployment's planning config, not a
      // test-only one
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same config-driven extension path as Verify/Bench/deployment
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // behavior-identical SortShuffleManager wrapper; inert unless
      // RetryDeterminismSpec arms graft.RetryInjector (test-only —
      // Verify/Bench run the stock manager)
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.KillingShuffleManager")
      // context-level (SparkConf) spill trigger: Spillable consumers
      // (ExternalAppendOnlyMap/ExternalSorter) force a spill past this
      // many in-memory elements regardless of heap headroom. 100k is
      // far above any sf0.001 per-task row count, so ordinary suites
      // never trip it; TopKSpec's spill test drives a synthetic frame
      // past it to exercise FinalTopK's spill path deterministically.
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "100000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val sfDir = "/root/testdata/sf0.001"
}
