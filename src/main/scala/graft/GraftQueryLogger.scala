package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.atomic.AtomicLong

/** A10 log sink (reference `private/logger.rkt:28-63`): the reference
  * runs a logger daemon that appends ISO8601-timestamped lines to a
  * log file and restarts the receiver daily (its rotation,
  * logger.rkt:49-63). The Spark restatement: a QueryExecutionListener
  * emits one structured line per query completion through log4j2 (the
  * logging engine Spark already ships), and rotation is declarative —
  * the checked-in RollingFile config at
  * `src/main/resources/graft-log4j2.xml` rolls by day and size
  * instead of a hand-rolled kill-and-restart thread.
  *
  * Wiring options, both supported:
  *  - config-driven (deployment):
  *    `--conf spark.sql.queryExecutionListeners=graft.GraftQueryLogger`
  *    plus `-Dlog4j2.configurationFile=.../graft-log4j2.xml`
  *  - programmatic: [[GraftQueryLogger.install]].
  */
class GraftQueryLogger extends QueryExecutionListener {
  private val log =
    org.apache.logging.log4j.LogManager.getLogger("graft.queries")

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    GraftQueryLogger.fired.incrementAndGet()
    log.info(s"query=$funcName status=ok duration_ms=${durationNs / 1000000L}" +
      s" root=${qe.executedPlan.nodeName}")
  }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = {
    GraftQueryLogger.fired.incrementAndGet()
    log.error(s"query=$funcName status=error" +
      s" msg=${Option(exception.getMessage).getOrElse(exception.getClass.getName)}")
  }
}

object GraftQueryLogger {
  /** Listener-fire counter — observable surface for tests (the log4j2
    * appender target is deployment config, not something a unit test
    * should reach into). */
  val fired = new AtomicLong()

  def install(s: SparkSession): GraftQueryLogger = {
    val l = new GraftQueryLogger
    s.listenerManager.register(l)
    l
  }
}
