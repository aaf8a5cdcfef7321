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
}
