package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more named
  * queries from SparkEntry.queries — the feedback loop for the 100-TB
  * plan-quality bar (broadcast choices, pushdown, codegen spans).
  * Usage: graft.Explain <sfDir> <queryName> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      // GRAFT_EXPLAIN_EXEC=1: additionally run the query and print the
      // FINAL adaptive plan — AQE-only rewrites (ReusedExchange, join
      // demotions, AQEShuffleRead) are invisible in the initial plan
      if (sys.env.get("GRAFT_EXPLAIN_EXEC").contains("1")) {
        df.queryExecution.toRdd.foreach(_ => ())
        println(s"---------- $n executed (final adaptive) ----------")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
