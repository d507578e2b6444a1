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

/** The streaming counterpart (same A10 sink): one log4j2 line per
  * streaming query start / progress / termination. Config-driven via
  * `spark.sql.streaming.streamingQueryListeners=graft.GraftStreamingLogger`
  * or programmatic via [[GraftStreamingLogger.install]]. */
class GraftStreamingLogger
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  private val log =
    org.apache.logging.log4j.LogManager.getLogger("graft.queries")

  // unnamed queries have a null name — fall back to the stable id so
  // log lines never carry a literal "null" token
  override def onQueryStarted(e: QueryStartedEvent): Unit = {
    GraftStreamingLogger.fired.incrementAndGet()
    log.info(s"stream=${Option(e.name).getOrElse(e.id)} status=started")
  }
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    GraftStreamingLogger.fired.incrementAndGet()
    log.info(s"stream=${Option(e.progress.name).getOrElse(e.progress.id)}" +
      s" batch=${e.progress.batchId}" +
      s" rows=${e.progress.numInputRows} status=progress")
  }
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    GraftStreamingLogger.fired.incrementAndGet()
    e.exception match {
      // failures go to ERROR with a one-line message, matching the
      // batch listener's convention (a raw stack trace would break the
      // one-line-per-event shape of the rolling sink)
      case Some(x) =>
        log.error(s"stream id=${e.id} status=error" +
          s" msg=${x.linesIterator.nextOption().getOrElse(x)}")
      case None => log.info(s"stream id=${e.id} status=terminated")
    }
  }
}

object GraftStreamingLogger {
  val fired = new AtomicLong()

  def install(s: SparkSession): GraftStreamingLogger = {
    val l = new GraftStreamingLogger
    s.streams.addListener(l)
    l
  }
}
