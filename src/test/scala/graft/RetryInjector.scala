package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.{SparkContext, TaskContext}
import org.apache.spark.sql.SparkSession

/** Test-only task-retry fault injector (VERDICT r12 #1). While armed,
  * the FIRST attempt of every task that touches a shuffle — writer or
  * reader side, so every map task, every reduce task, every
  * repartitionByRange consumer, every iterative-loop round — is killed
  * and rescheduled, the failure mode production clusters exercise
  * routinely (preemption, speculation, lost executors) and local runs
  * never do. The r12 slice-consistency bug proved this hazard class is
  * live: any stage whose output depends on WHICH attempt computed it
  * (sampled bounds, unstable orderings, off-grid float merges) turns a
  * routine retry into silent corruption.
  *
  * Mechanism: [[org.apache.spark.shuffle.graft.KillingShuffleManager]]
  * (installed by the shared test session, pure pass-through when
  * disarmed) calls [[maybeKill]] inside the task thread. On a first
  * attempt we request an async `SparkContext.killTaskAttempt` of our
  * own attempt and block until the interrupt lands; the scheduler
  * marks the context killed BEFORE interrupting, so the propagating
  * InterruptedException is reported as TaskKilled — which does NOT
  * count toward spark.task.maxFailures, so the stock local[4] master
  * reschedules the attempt instead of failing the job. */
object RetryInjector {
  private val enabled = new AtomicBoolean(false)
  @volatile private var sc: SparkContext = _
  /** Attempts killed-and-rescheduled while armed (assertion signal). */
  val killed = new AtomicInteger(0)
  /** Kill requests that never landed within the wait window — the
    * task proceeded normally (should stay 0; harmless if not). */
  val missed = new AtomicInteger(0)
  /** Consecutive misses (reset by every landed kill) — 5 in a row
    * disarms the injector so a systemically broken kill path fails
    * the spec fast instead of stalling every task 10 s. */
  private val missStreak = new AtomicInteger(0)

  /** Called from shuffle getWriter/getReader INSIDE the task thread. */
  def maybeKill(context: TaskContext): Unit = {
    if (!enabled.get() || context == null) return
    if (context.attemptNumber() != 0) return
    val ctx = sc
    if (ctx == null) return
    val tid = context.taskAttemptId()
    val t = new Thread(
      () =>
        try { ctx.killTaskAttempt(tid, interruptThread = true,
          reason = "graft retry-determinism injection"); () }
        catch { case _: Throwable => () },
      s"graft-retry-kill-$tid")
    t.setDaemon(true)
    t.start()
    try {
      Thread.sleep(10000)
      // the kill never landed: proceed normally, and after a few
      // CONSECUTIVE misses DISARM — a broken injector must fail the
      // spec's kills>0 assertion in seconds, not stall every first
      // attempt of hundreds of tasks for 10 s each (review r13).
      // Consecutive, not cumulative: sporadic misses on a loaded box
      // must not silently disarm a long run mid-way (review r13 #2) —
      // a landed kill resets the streak.
      missed.incrementAndGet()
      if (missStreak.incrementAndGet() >= 5) {
        System.err.println("[retry-injector] 5 consecutive kill " +
          "requests missed — disarming; the spec's kill assertion " +
          "will fail fast")
        enabled.set(false)
      }
      ()
    } catch {
      case e: InterruptedException =>
        killed.incrementAndGet()
        missStreak.set(0)
        throw e
    }
  }

  /** Arm the injector around `body`; returns (result, kills landed). */
  def run[A](spark: SparkSession)(body: => A): (A, Int) = {
    killed.set(0)
    missed.set(0)
    missStreak.set(0)
    sc = spark.sparkContext
    enabled.set(true)
    try { val a = body; (a, killed.get()) }
    finally enabled.set(false)
  }

  // ------------------------------------------------- stage-resubmission mode

  private val fetchFailEnabled = new AtomicBoolean(false)
  private val fetchFailedOnce =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  /** FetchFailedExceptions raised while armed (assertion signal). */
  val fetchFails = new AtomicInteger(0)

  /** Decision seam for the shuffle reader hook: true exactly once per
    * (shuffleId, startPartition) while fetch-fail mode is armed. The
    * actual FetchFailedException (private[spark]) is raised by the
    * org.apache.spark-package shim — the DAGScheduler unregisters the
    * blamed map output and RESUBMITS the map stage, then re-runs the
    * failed reduce partitions: the lost-executor / lost-shuffle
    * recovery path, one level above a plain task retry. Any stage
    * whose re-execution produces different data (re-sampled bounds,
    * order-dependent folds) corrupts results exactly here. Raised at
    * most ONCE PER SHUFFLE: per-partition injection would fail the
    * same consuming stage once per partition across its retry
    * attempts and abort at maxConsecutiveStageAttempts (4) on any
    * shuffle wider than 4 partitions; one failure per shuffle still
    * resubmits every map stage in the plan exactly once. (Resubmitted
    * task sets also restart at attemptNumber 0, so an attempt-based
    * guard would loop.) */
  def shouldFetchFail(shuffleId: Int, startPartition: Int): Boolean = {
    if (!fetchFailEnabled.get() || sc == null) return false
    if (!fetchFailedOnce.add(shuffleId)) return false
    fetchFails.incrementAndGet()
    true
  }

  /** Arm fetch-fail mode around `body`; returns (result, fetch fails
    * raised). */
  def runFetchFail[A](spark: SparkSession)(body: => A): (A, Int) = {
    fetchFails.set(0)
    fetchFailedOnce.clear()
    sc = spark.sparkContext
    fetchFailEnabled.set(true)
    try { val a = body; (a, fetchFails.get()) }
    finally fetchFailEnabled.set(false)
  }
}
