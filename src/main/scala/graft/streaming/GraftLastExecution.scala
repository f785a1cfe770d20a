package org.apache.spark.sql.execution.streaming.runtime

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.streaming.StreamingQuery

/** `private[sql]` bridge for [[graft.streaming.MicroBatchPlans]]: the
  * classic `StreamingQueryWrapper.lastExecution` accessor is
  * `private[sql]` at the Scala level (public only in bytecode), so the
  * one-line read lives in Spark's package namespace — same pattern and
  * rationale as `GraftAdaptiveMetrics`, pinned to the Spark 4.1.2 jars
  * this build compiles against. */
object GraftLastExecution {
  /** The final micro-batch's executed physical plan, if `q` is a
    * classic streaming handle that ran at least one batch. */
  def lastExecutedPlan(q: StreamingQuery): Option[SparkPlan] = q match {
    case w: StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution).map(_.executedPlan)
    case _ => None
  }
}
