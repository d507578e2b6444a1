package org.apache.spark.shuffle.graft

import org.apache.spark.{ShuffleDependency, SparkConf, TaskContext}
import org.apache.spark.shuffle.{FetchFailedException, ShuffleBlockResolver,
  ShuffleHandle, ShuffleManager, ShuffleReader, ShuffleReadMetricsReporter,
  ShuffleWriteMetricsReporter, ShuffleWriter}
import org.apache.spark.shuffle.sort.SortShuffleManager

/** Test-only delegating shuffle manager: behavior-identical to
  * SortShuffleManager (same handles, same writer selection, same
  * reader) except that while [[graft.RetryInjector]] is armed it kills
  * the first attempt of every task that opens a shuffle writer or
  * reader — see RetryInjector for the mechanism and why. Lives under
  * org.apache.spark.shuffle because SortShuffleManager is
  * private[spark] (same shim precedent as ListenerBusAccess). */
final class KillingShuffleManager(conf: SparkConf) extends ShuffleManager {
  private val delegate = new SortShuffleManager(conf)

  override def registerShuffle[K, V, C](
      shuffleId: Int,
      dependency: ShuffleDependency[K, V, C]): ShuffleHandle =
    delegate.registerShuffle(shuffleId, dependency)

  override def getWriter[K, V](
      handle: ShuffleHandle, mapId: Long, context: TaskContext,
      metrics: ShuffleWriteMetricsReporter): ShuffleWriter[K, V] = {
    graft.RetryInjector.maybeKill(context)
    delegate.getWriter(handle, mapId, context, metrics)
  }

  override def getReader[K, C](
      handle: ShuffleHandle, startMapIndex: Int, endMapIndex: Int,
      startPartition: Int, endPartition: Int, context: TaskContext,
      metrics: ShuffleReadMetricsReporter): ShuffleReader[K, C] = {
    graft.RetryInjector.maybeKill(context)
    if (graft.RetryInjector.shouldFetchFail(handle.shuffleId, startPartition))
      throw new FetchFailedException(
        org.apache.spark.SparkEnv.get.blockManager.blockManagerId,
        handle.shuffleId, 0L, 0, startPartition,
        "graft stage-resubmission injection", null)
    delegate.getReader(handle, startMapIndex, endMapIndex,
      startPartition, endPartition, context, metrics)
  }

  override def unregisterShuffle(shuffleId: Int): Boolean =
    delegate.unregisterShuffle(shuffleId)

  override def shuffleBlockResolver: ShuffleBlockResolver =
    delegate.shuffleBlockResolver

  override def stop(): Unit = delegate.stop()
}
