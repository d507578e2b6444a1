package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated TPC-H-ish star schema
  * (TESTDATA.md). One parquet file per table under `dir`.
  *
  * Scale notes (100 TB): `spark.read.parquet` is the DataSourceV2
  * vectorized reader — filter pushdown, column pruning and partition
  * pruning all apply as long as callers keep plans declarative (no
  * `.rdd`, no early `.cache()` of unpruned scans). At cluster scale the
  * same call reads a partitioned directory tree; nothing here assumes a
  * single file.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long and convert to
    * microsecond TimestampType with integer arithmetic (`DIV` — double
    * division would lose precision above 2^53). `DIV` truncates toward
    * zero, which equals floor for non-negative inputs; the generator
    * emits only post-epoch timestamps (min observed 2024-01-01, see
    * TablesSpec which asserts ts > 0), so this matches DuckDB's ns→us
    * conversion exactly. NOTE deliberate session-conf side effect: the
    * nanosAsLong legacy flag must be set before the read is planned;
    * it is documented here and also set at session build time in
    * Verify/Bench so callers constructing their own sessions agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Spread a scan across the cluster before compute-heavy per-row
    * work. Every test table is ONE parquet file with ONE row group —
    * an unsplittable single input partition — so expensive projections
    * (JSON parsing, regex, libm, hashing) would otherwise run on a
    * single task until the first shuffle. The explicit count keeps AQE
    * from coalescing the tiny exchange straight back to one partition.
    * On a real many-file table the scan is already parallel and
    * callers would drop this. */
  def par(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  /** Keyed variant of [[par]] for callers that also want co-location
    * by a column (e.g. documents by doc_id). */
  def par(s: SparkSession, df: DataFrame, key: Column): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism, key)
}

/** A named query + its DuckDB oracle SQL. Modules contribute these and
  * `SparkEntry` unions them — the driver hash-compares each query's
  * parquet dump against the oracle run by DuckDB on the same tables.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** DuckDB-dialect SQL over bare table names (driver registers views).
    * Omit a key for non-SQL-expressible ops → weaker rows-only check. */
  def oracles: Map[String, String]
}
