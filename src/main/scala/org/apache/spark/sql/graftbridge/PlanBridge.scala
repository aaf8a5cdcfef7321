package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one Spark-internal seam the engine uses: rebuild a `DataFrame`
  * from an already-analyzed [[LogicalPlan]] (`Dataset.ofRows` is
  * `private[sql]`, hence this bridge package). Used by
  * [[graft.core.PlanMemo]] to serve a prepared statement's cached
  * logical plan — the fresh `Dataset` gets its own `QueryExecution`,
  * so optimization, physical planning, AQE, and every exchange run
  * anew on each action; ONLY the per-call DataFrame-API construction
  * and eager re-analysis are skipped.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
