package org.apache.spark.graft

import org.apache.spark.util.collection.ExternalAppendOnlyMap

/** Bridge into Spark's `private[spark]` spillable map so graft physical
  * operators can aggregate per-key state without a hard in-memory bound
  * (same one-file shim pattern as [[org.apache.spark.sql.GraftColumnBridge]]).
  *
  * `ExternalAppendOnlyMap` is the machinery behind RDD `combineByKey`:
  * a size-tracking hash map that acquires execution memory from the
  * task's `TaskMemoryManager`, spills sorted-by-key-hash runs to disk
  * under pressure (also honouring
  * `spark.shuffle.spill.numElementsForceSpillThreshold`, which tests
  * use to force the spill path), and merge-sorts in-memory + on-disk
  * runs on iteration, calling `mergeCombiners` on equal keys across
  * runs. Spill metrics land in the task's memory/diskBytesSpilled. The
  * wrapper keeps the package-private type OUT of graft's signatures:
  * callers hand over combiner callbacks and get a plain iterator back.
  */
object GraftSpillBridge {

  /** Group `entries` by key with combiner semantics, spilling to disk
    * under memory pressure. Must run inside a task (needs TaskContext).
    *
    * Caller contract: both `K` and any state captured in `C` must
    * survive java serialization (spill runs go through the SparkEnv
    * serializer), and `V` inputs are only read synchronously during
    * insert — the map never buffers a raw `V`, so reused-buffer rows
    * may be passed as-is if the combiner copies what it keeps.
    */
  def combineByKey[K, V, C](entries: Iterator[(K, V)],
      createCombiner: V => C,
      mergeValue: (C, V) => C,
      mergeCombiners: (C, C) => C): Iterator[(K, C)] = {
    val map = new ExternalAppendOnlyMap[K, V, C](
      createCombiner, mergeValue, mergeCombiners)
    map.insertAll(entries)
    // The map tracks its own spill counters; the CALLER owns surfacing
    // them (same contract as core's Aggregator.updateMetrics) — without
    // this the UI/metrics report zero spill no matter what hit disk.
    // Two-phase accounting: the insert-phase counters (the dominant
    // component) are recorded HERE, unconditionally — an abandoned
    // output iterator (LocalLimit / stopEarly above the operator) must
    // not zero them — and the iteration-phase DELTA lands on iterator
    // completion, because destructive iteration can still force-spill
    // under memory pressure.
    val ctx0 = org.apache.spark.TaskContext.get()
    val memAtInsert = map.memoryBytesSpilled
    val diskAtInsert = map.diskBytesSpilled
    val peakAtInsert = map.peakMemoryUsedBytes
    if (ctx0 != null) {
      ctx0.taskMetrics().incMemoryBytesSpilled(memAtInsert)
      ctx0.taskMetrics().incDiskBytesSpilled(diskAtInsert)
      ctx0.taskMetrics().incPeakExecutionMemory(peakAtInsert)
    }
    org.apache.spark.util.CompletionIterator[(K, C), Iterator[(K, C)]](
      map.iterator, {
        val ctx = org.apache.spark.TaskContext.get()
        if (ctx != null) {
          // Deltas only — the accumulators are additive, so insert-phase
          // amounts must not be double-counted.
          ctx.taskMetrics().incMemoryBytesSpilled(
            map.memoryBytesSpilled - memAtInsert)
          ctx.taskMetrics().incDiskBytesSpilled(
            map.diskBytesSpilled - diskAtInsert)
          ctx.taskMetrics().incPeakExecutionMemory(
            math.max(0L, map.peakMemoryUsedBytes - peakAtInsert))
        }
      })
  }

  /** Drain the listener bus (private[spark]) — lets tests assert on
    * task metrics (spill bytes) deterministically after a job. */
  def waitListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
