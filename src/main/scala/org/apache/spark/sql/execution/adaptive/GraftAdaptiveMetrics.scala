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
  * the case where the warning vanished. Materialized stages stay
  * registered in the adaptive context's stage cache, so the metric
  * rows are still readable from there.
  *
  * Scope: the stage cache is only populated under
  * `spark.sql.exchange.reuse=true` (the default; verified against the
  * pinned 4.1.2 jar — `AdaptiveSparkPlanExec` guards
  * `stageCache.getOrElseUpdate` with `conf.exchangeReuseEnabled`). With
  * reuse disabled the recovery finds nothing and callers fall back to
  * the final-tree-only coverage they had before this helper existed.
  */
object GraftAdaptiveMetrics {

  /** All CollectMetrics rows reachable from `plan`, INCLUDING nodes
    * that survive only inside cached adaptive stages, and descending
    * into expression subquery plans (scalar/EXISTS/IN — mirroring
    * `observedMetrics`' collectWithSubqueries coverage). Rows whose
    * accumulator never ran come back as the aggregation's initial
    * values (sums NULL/0) — callers treat those as "did not fire". */
  def observedMetricsWithStages(plan: SparkPlan): Map[String, Row] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Row]
    // AQE re-planning CLONES operator trees, and each CollectMetricsExec
    // clone owns a fresh lazy accumulator — so the walk can meet both
    // the copy that executed (live values) and a never-run clone of the
    // SAME metric name (all-null initial state), in nondeterministic
    // stage-cache iteration order. A populated row must never be
    // clobbered by an initial-state one.
    def allNull(r: Row) = (0 until r.length).forall(r.isNullAt)
    def offer(name: String, row: Row): Unit =
      if (!out.get(name).exists(prev => !allNull(prev) && allNull(row)))
        out(name) = row
    // IDENTITY-keyed cycle guard: a subquery's AdaptiveSparkPlanExec
    // shares its parent's AdaptiveExecutionContext, so walking the
    // shared stageCache from inside a subquery reaches the subquery
    // expression again — without this the walk recurses forever.
    // Identity (not equality): case-class-equal CollectMetricsExec
    // clones own DIFFERENT accumulators and must each be offered.
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = if (seen.add(p)) {
      p match {
        case a: AdaptiveSparkPlanExec =>
          // cached stages first, final tree second: among populated
          // copies the final tree's wins (same accumulator)
          a.context.stageCache.values.foreach(s => walk(s.plan))
          walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case c: CollectMetricsExec =>
          offer(c.name, c.collectedMetrics)
          c.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      // a subquery's AdaptiveSparkPlanExec hangs off an EXPRESSION, not
      // a child — `children` alone never reaches it
      p.subqueries.foreach(walk)
    }
    walk(plan)
    out.toMap
  }
}
