package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — the co-located-join path for fact⋈fact
  * joins that would otherwise shuffle both sides on every query
  * (SURVEY §2.4 "repartition/bucketing for co-located joins").
  *
  * Writing both fact tables bucketed by the join key with the same
  * bucket count means every subsequent join on that key is exchange-
  * free: each task reads matching buckets from both sides. At 100 TB
  * this converts the per-query orders⋈lineitem all-to-all (the one
  * unavoidable shuffle in the C11 star shape) into a one-off cost paid
  * at ingest.
  */
object Bucketing {

  /** Write `df` as a bucketed (and per-bucket sorted) catalog table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket keys — planner
    * skips both exchanges (asserted in the test suite). */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
