package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the scored surface: one entry per operator from
  * SURVEY.md §2, each paired (where SQL-expressible) with a DuckDB
  * oracle in `oracleSql`. Modules contribute via [[QueryModule]].
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    graft.ops.Relational,
    graft.ops.Functions,
    graft.ops.Llm,
    graft.ops.LlmExt,
    graft.sources.NormalizeQueries,
    graft.streaming.Streams,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Cuttlefish-semantics shape: scan + JSON extraction (A14) + dimension
    * broadcast join + hash aggregation + deterministic order. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        round(avg(col("k")), 2).as("avg_k"))
      .orderBy(col("event_type"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
