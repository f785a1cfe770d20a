package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Z-order (Morton) value over k numeric columns — the multi-column
    * clustering key for range-scan locality (the layout technique
    * behind Delta/Iceberg `OPTIMIZE ZORDER`): each column is bucketed
    * to `bits` bits and the bucket bits are INTERLEAVED, so rows close
    * in z-value are close in EVERY clustered dimension at once. Sorting
    * the warehouse by one column gives perfect locality on that column
    * and none on the others; sorting by the z-value gives ~`bits`-bit
    * locality on all of them — a predicate on ANY clustered column
    * touches a bounded fraction of files, and parquet min/max row-group
    * pruning actually bites ([[zCluster]] + BucketingSpec's span
    * assertion).
    *
    * Buckets here are equal-width over [min, max], spelled as explicit
    * floor arithmetic in pinned order (each step one correctly-rounded
    * IEEE op — bit-identical on any engine, where `width_bucket`
    * implementations differ in the last ulp at bucket boundaries);
    * heavily skewed columns want the quantile flavor: pass pre-computed
    * cut ranks as the column instead (the interleave is agnostic to how
    * the bucket id was produced).
    *
    * Pure column algebra — `bits·k` shift/mask/or terms, no HOF, no
    * UDF, stays inside whole-stage codegen and restates 1:1 in any SQL
    * engine. */
  def zValue(cols: Seq[(Column, Column, Column)], bits: Int = 8): Column = {
    require(cols.nonEmpty && bits > 0 && bits * cols.size <= 62,
      s"z-order geometry out of range: ${cols.size} cols × $bits bits")
    val n = (1 << bits).toLong
    val k = cols.size
    val buckets = cols.map { case (c, mn, mx) =>
      val v = c.cast("double")
      val lo = mn.cast("double")
      val hi = mx.cast("double")
      // floor((v−lo)·n / (hi−lo)) clamped to 0..n−1; degenerate
      // single-value domain collapses to bucket 0 (the NaN guard)
      when(hi === lo, lit(0L)).otherwise(
        least(greatest(floor((v - lo) * lit(n.toDouble) / (hi - lo)),
          lit(0L)), lit(n - 1)))
    }
    // bit j of column i lands at position j·k + i (low bits first)
    val terms = for {
      j <- 0 until bits
      (b, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)).cast(LongType),
      j * k + i)
    terms.reduce(_.bitwiseOR(_)).as("zv")
  }

  /** Cluster a frame for multi-column range locality: range-partition
    * and sort by the z-value of `colNames`. Column domains come from
    * ONE distributed min/max aggregate (a 2k-value driver row — the
    * same bounded-collect class as the IVF fronts). The result writes
    * with any sink; each output file then spans a narrow range of every
    * clustered column, so min/max stats prune files AND row groups for
    * predicates on any of them. One range exchange — the same cost the
    * writer's repartition already pays, redirected to a useful order.
    * The z-value is an internal ordering device and is dropped after
    * the sort (a projection — partitioning and intra-partition order
    * survive), so the result has the INPUT's schema and writes with any
    * sink. */
  def zCluster(df: DataFrame, colNames: Seq[String], nPartitions: Int,
      bits: Int = 8): DataFrame = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head() // bounded: 2k values
    val triples = colNames.zipWithIndex.map { case (c, i) =>
      (col(c), lit(row.get(2 * i)), lit(row.get(2 * i + 1)))
    }
    df.withColumn("__zv", zValue(triples, bits))
      .repartitionByRange(nPartitions, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
  }
}
