package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Dev tool: run one named query and print per-stage wall times from a
  * SparkListener — where the shuffles and scans actually spend time.
  * Usage: graft.Profile <sfDir> <queryName> [cpus]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = if (args.length > 2) args(2) else "8"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = ArrayBuffer[(Int, String, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        // executor CPU-seconds: what the query costs a contended box,
        // independent of how many idle cores happened to be available
        val cpuMs = i.taskMetrics.executorCpuTime / 1000000
        stages.synchronized {
          stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(90), ms,
            i.numTasks, cpuMs))
        }
      }
    })
    // warm-up then timed, like Bench
    SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd
      .foreach(_ => ())
    stages.synchronized(stages.clear())
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd
      .foreach(_ => ())
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // let listener drain
    stages.synchronized {
      val cpuTotal = stages.map(_._5).sum / 1e3
      println(f"TOTAL $name: $total%.2f s wall, $cpuTotal%.1f executor-CPU-s")
      stages.sortBy(-_._3).take(15).foreach { case (id, nm, ms, tasks, cpu) =>
        println(f"  stage $id%-4d ${ms}%6d ms  ${cpu}%6d cpu-ms  $tasks%3d tasks  $nm")
      }
    }
    spark.stop()
  }
}
