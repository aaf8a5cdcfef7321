package org.apache.spark.scheduler

import org.apache.spark.SparkContext

/** Synchronous job counter for [[graft.core.PlanMemo]]'s purity
  * probe. `SparkListener.onJobStart` is delivered async (a job
  * launched during query construction could be counted AFTER the
  * probe reads the listener's counter, mis-classifying the query as
  * pure), so the probe reads the DAGScheduler's own job-id allocator,
  * which increments synchronously inside `submitJob`/`runJob` —
  * `private[scheduler]`, hence this bridge package.
  */
object GraftScheduler {
  def jobsSubmitted(sc: SparkContext): Long =
    sc.dagScheduler.numTotalJobs.toLong

  /** Block until the live listener bus has delivered every queued
    * event (or the timeout). `QueryExecutionListener` callbacks ride
    * this bus asynchronously — a plan-capturing test listener
    * (PipelinePlanSweepSpec) must drain it before reading its capture
    * buffer, and `LiveListenerBus.waitUntilEmpty` is `private[spark]`,
    * hence this bridge. */
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
