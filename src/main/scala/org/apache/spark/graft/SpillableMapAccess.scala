package org.apache.spark.graft

import org.apache.spark.util.collection.ExternalAppendOnlyMap

/** `ExternalAppendOnlyMap` — Spark's spilling combine-by-key map, the
  * machinery behind RDD combineByKey — is `private[spark]`. graft's
  * FinalTopKExec needs exactly its contract: per-group combiners that
  * stay correct while the map spills sorted runs to disk under memory
  * pressure, so a high-cardinality grouping degrades gracefully
  * instead of OOMing an executor (review r13: an in-heap HashMap of
  * per-group heaps would convert "slower but completes" into a
  * failure precisely on the queries the operator exists to speed up).
  * Same minimal package-injection bridge as [[ListenerBusAccess]].
  *
  * Serialization contract for spills: K and C flow through the
  * SparkEnv serializer when a run is written to disk, so both must be
  * Java-serializable (UnsafeRow is Externalizable; keep C to plain
  * collections of UnsafeRow). The three merge closures are NEVER
  * serialized — they live only in the running task.
  */
final class SpillableCombiningMap[K, V, C] private[graft] (
    m: ExternalAppendOnlyMap[K, V, C]) {
  /** Feed every (key, value); combiners merge in memory and spill as
    * sized runs under the task's memory manager. */
  def insertAll(entries: Iterator[Product2[K, V]]): Unit =
    m.insertAll(entries)
  /** Destructive merged iterator over (key, combiner) — in-memory map
    * plus every spilled run; resources release on task completion. */
  def iterator: Iterator[(K, C)] = m.iterator

  /** Propagate the map's spill/peak-memory counters into the task's
    * metrics (what RDD Aggregator.updateMetrics does) — without this
    * the spills happen but stage metrics read 0 and monitoring is
    * blind to the pressure. Call once, after insertAll. */
  def updateTaskMetrics(): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) {
      tc.taskMetrics().incMemoryBytesSpilled(m.memoryBytesSpilled)
      tc.taskMetrics().incDiskBytesSpilled(m.diskBytesSpilled)
      tc.taskMetrics().incPeakExecutionMemory(m.peakMemoryUsedBytes)
    }
  }
}

object SpillableMapAccess {
  /** Build a spillable combine-by-key map bound to the CURRENT task
    * (callers sit inside mapPartitions; the default constructor wires
    * TaskContext.get()'s memory manager and the env serializer). */
  def create[K, V, C](createCombiner: V => C, mergeValue: (C, V) => C,
      mergeCombiners: (C, C) => C): SpillableCombiningMap[K, V, C] =
    new SpillableCombiningMap(new ExternalAppendOnlyMap[K, V, C](
      createCombiner, mergeValue, mergeCombiners))
}
