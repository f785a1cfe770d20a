package graft.ext

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact GLOBAL ranking at scale — the answer to the single-partition
  * window trap: `ROW_NUMBER() OVER (ORDER BY …)` with no PARTITION BY
  * collapses the whole dataset onto one task (Spark even warns), which
  * is the one plan shape guaranteed to fail at 100 TB. Global rank is
  * still a one-shuffle computation if done as the classic two-phase:
  *
  *  1. `repartitionByRange` on the total order — one range exchange,
  *     every partition holds a disjoint key interval;
  *  2. per-partition counts → prefix-sum offsets (bounded driver
  *     table: ≤ numPartitions longs; the count job reuses the range
  *     shuffle's files, it does not rescan the source);
  *  3. sorted per-partition enumeration seeded at the partition's
  *     offset — `mapPartitions` over the sorted iterator, the
  *     documented last-resort tier used for exactly this kind of
  *     genuinely positional per-partition logic.
  *
  * The order MUST be total (caller supplies tiebreak columns): unique
  * keys mean no tie can straddle a range boundary, so the result is
  * bit-identical to the single-partition window at ANY partition count
  * or input layout (spec-pinned). Use cases: global quantile
  * normalization of a feature, exact percentile split points,
  * curriculum ordering by a score.
  */
object Ranking {

  /** Appends `rn` (1-based exact global row number in `orderCols`
    * order) and `pct` (quantile-normalized rank `(rn−1)/(n−1)`, the
    * rank-transform feature). `numPartitions` is explicit so the
    * count pass and the enumeration pass see the same layout. */
  def globalRowNumber(
      df: DataFrame,
      orderCols: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "Ranking.globalRowNumber: orderCols must be non-empty")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    // .rdd pins the executed plan with the local sort at the root
    // (a Dataset.mapPartitions above it would let the optimizer drop
    // the sort — object consumers declare no ordering requirement);
    // zipWithIndex is the offsets pass: one extra job over the SAME
    // shuffle files computing per-partition counts (bounded), then a
    // seeded enumeration of each sorted partition.
    val spark = df.sparkSession
    val withIdx = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    val outSchema = ranged.schema.add("rn", LongType, nullable = false)
    val out = spark.createDataFrame(withIdx, outSchema)
    // total as a literal (parquet-footer count — never a window over
    // the full frame, which would be its own single-partition trap)
    val total = df.count()
    out.withColumn("pct",
      (col("rn") - lit(1L)).cast("double") / lit((total - 1L).toDouble))
  }
}
