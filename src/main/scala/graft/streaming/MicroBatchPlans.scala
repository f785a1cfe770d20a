package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.streaming.StreamingQuery

/** Capture of the LAST micro-batch physical plan per declared streaming
  * query (ADVICE r14 / PlanGoldenSpec): a terminated `StreamingQuery`
  * handle still references its final `IncrementalExecution`, and
  * `StreamingQueryWrapper.lastExecution` is public API in Spark 4 — so
  * the declared streaming queries record it here right after
  * `awaitTermination()`, and [[graft.PlanGoldenSpec]] goldens its
  * skeleton next to the batch-readback plan. Without this the streaming
  * goldens pin only the post-stream memory/parquet readback — the
  * micro-batch plan the bench cost actually flows through would be free
  * to drift shape unnoticed.
  *
  * Scope note: for foreachBatch sinks (e54/e55) the micro-batch plan is
  * the ADMISSION shape — bounded file-source scan feeding the batch
  * closure; the heavy inner work (incrementalDedup / appendToIndex) runs
  * as ordinary batch queries whose code path is golden-pinned through
  * the declared batch flavors (e52/e53). Keeping the map bounded: one
  * entry per declared query name, overwritten per run.
  */
object MicroBatchPlans {
  private val plans = new ConcurrentHashMap[String, SparkPlan]()

  /** Record `q`'s last micro-batch executed plan under `name`. Safe to
    * call after termination; a handle that is not a classic
    * `StreamingQueryWrapper` (or ran zero batches) records nothing. */
  def record(name: String, q: StreamingQuery): Unit =
    org.apache.spark.sql.execution.streaming.runtime.GraftLastExecution
      .lastExecutedPlan(q)
      .foreach { plan => plans.put(name, plan); () }

  def get(name: String): Option[SparkPlan] = Option(plans.get(name))
}
