package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.GraftAdaptiveMetrics
import org.apache.spark.sql.functions._

/** The drop-warning's worst swallow: when the bound drops EVERY
  * candidate, AQE's empty-relation propagation replaces the join above
  * the now-empty frame — and the CollectMetrics node in the discarded
  * subtree vanishes from the final plan even though its stage ran
  * (that materialization is how AQE learned the row count).
  * `GraftAdaptiveMetrics` recovers the rows from the adaptive stage
  * cache; this spec pins both the swallow and the recovery.
  */
class ObservedDropsSpec extends SparkSpec {

  test("AQE empty propagation swallows the final-plan metric; stage-cache recovery reads it") {
    // The e23/lshDupPairs shape in miniature: observe BEFORE a filter
    // that (at runtime) empties the frame, then join. Constraint
    // propagation must be OFF here: with it on, Catalyst infers
    // `id < -1` onto the right join side too, so BOTH stages race to
    // materialize empty — and when the right one wins, AQE cancels the
    // metric-carrying stage MID-FLIGHT and the accumulator honestly
    // never completes (the documented best-effort boundary of the
    // recovery, not its target). With inference off, only the observed
    // side is empty, so AQE can learn emptiness solely from the stage
    // that holds the metric — the accumulator deterministically ran.
    // (e23's real self-join shape has this property intrinsically: both
    // sides ARE the observed frame, one exchange-reused stage.)
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try {
      val observed = ObservedDrops.observe(
          spark.range(100).toDF("id"), "test_recovery",
          sum(when(col("id") >= 0, 1L).otherwise(0L)), max(col("id")))
        .filter(col("id") < -1) // runtime-empty AFTER the metric
        .repartition(col("id"))
      val joined = observed.join(spark.range(100).toDF("id"), "id")
      assert(joined.collect().isEmpty)

      val qe = joined.queryExecution
      def key(m: Map[String, org.apache.spark.sql.Row]) =
        m.keys.find(_.startsWith("graft_drop_test_recovery"))

      // the swallow this helper exists for (if a Spark upgrade makes
      // this fail, the recovery became redundant — delete both, happily)
      assert(key(qe.observedMetrics).isEmpty,
        s"expected AQE to drop the metric from the final plan; got ${qe.observedMetrics.keys}")

      val recovered = GraftAdaptiveMetrics.observedMetricsWithStages(qe.executedPlan)
      val k = key(recovered)
      assert(k.nonEmpty, s"recovery found only ${recovered.keys}")
      val row = recovered(k.get)
      assert(!row.isNullAt(0) && row.getLong(0) == 100L,
        s"accumulator should have seen all 100 pre-filter rows, got $row")
      assert(row.getLong(1) == 99L)
    } finally spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
  }

  test("a metric surviving in the final plan resolves to the final tree's row") {
    val observed = ObservedDrops.observe(
        spark.range(50).toDF("id"), "test_survives",
        sum(lit(1L)), max(col("id")))
      .repartition(col("id"))
    assert(observed.collect().length == 50)
    val qe = observed.queryExecution
    val finalRow = qe.observedMetrics.collectFirst {
      case (n, r) if n.startsWith("graft_drop_test_survives") => r
    }
    assert(finalRow.nonEmpty)
    val recovered = GraftAdaptiveMetrics.observedMetricsWithStages(qe.executedPlan)
      .collectFirst { case (n, r) if n.startsWith("graft_drop_test_survives") => r }
    assert(recovered.contains(finalRow.get))
  }
}
