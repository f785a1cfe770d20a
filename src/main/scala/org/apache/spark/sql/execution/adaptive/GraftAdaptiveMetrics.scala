package org.apache.spark.sql.execution.adaptive

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.{CollectMetricsExec, SparkPlan}

/** Recover `observe` (CollectMetrics) metric rows that ADAPTIVE
  * execution dropped from the FINAL plan tree.
  *
  * Why this exists (and why it lives in Spark's package namespace —
  * `AdaptiveExecutionContext.stageCache` is `private[adaptive]`-ish
  * surface, pinned to the Spark 4.1.2 jars this build compiles
  * against): AQE's empty-relation propagation replaces everything
  * above a materialized 0-row stage with `EmptyRelation`. When a
  * CollectMetrics node sits in the discarded subtree, its accumulator
  * HAS run (the stage materialized — that is how AQE learned the row
  * count) but `QueryExecution.observedMetrics` walks only the final
  * tree and never sees it. For the engine's bounded-drop guards
  * (`graft.ext.ObservedDrops`: jaccard maxDf, LSH maxBucket) this is
  * the worst possible swallow: the one case where EVERY candidate was
  * dropped — the empty result most needs its explanation — is exactly
  * the case where the warning vanished. The materialized stages stay
  * registered in the adaptive context's stage cache, so the metric
  * rows are still readable from there.
  */
object GraftAdaptiveMetrics {

  /** All CollectMetrics rows reachable from `plan`, INCLUDING nodes
    * that survive only inside cached adaptive stages. Rows whose
    * accumulator never ran come back as the aggregation's initial
    * values (sums NULL/0) — callers treat those as "did not fire". */
  def observedMetricsWithStages(plan: SparkPlan): Map[String, Row] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Row]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec =>
        // cached stages first, final tree second: a node present in
        // both resolves to the final tree's copy (same accumulator)
        a.context.stageCache.values.foreach(s => walk(s.plan))
        walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case c: CollectMetricsExec =>
        out(c.name) = c.collectedMetrics
        c.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(plan)
    out.toMap
  }
}
