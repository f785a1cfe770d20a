package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-column data-layout clustering via Z-order (Morton) curves.
  *
  * The 100 TB problem this solves: parquet file skipping works off
  * per-file min/max column ranges, and a single-column sort gives tight
  * ranges on ONE column only — a filter on any other column still reads
  * every file. Interleaving the bits of two normalized dimensions into
  * one z-value and range-partitioning the write on it bounds EVERY
  * file's extent in BOTH dimensions (a 64-bucket z-layout is an 8×8
  * grid over the 2-D key space), so min/max pruning engages for filters
  * on either column or both. Same idea as the OPTIMIZE ZORDER layout of
  * public lakehouse engines; implemented here as pure codegen'd integer
  * arithmetic — no UDF, no shuffle beyond the one range exchange the
  * write itself needs.
  *
  * Normalization is fixed-point min/max scaling to 16 bits per
  * dimension: `nx = ((x - min) * 2^16) div (max - min + 1)`, exact
  * integer arithmetic end to end (the declared flavor's parity proof is
  * the DuckDB oracle replaying every shift and mask, e80). min/max come
  * from one map-side-combined aggregate — two longs per column, O(1)
  * driver state embedded as plan literals, the same bounded-collect
  * pattern as the IVF centroids. At 100 TB with heavy value skew,
  * min/max scaling wastes z-resolution on empty range; production
  * callers pass quantile boundaries (e.g. from `approx_percentile` or
  * the engine's KMV sketch) through the [[Bounds]] override — the
  * interleave itself is unchanged. Two dimensions are the declared
  * surface (the overwhelmingly common case); more dimensions generalize
  * by widening the spread stride at proportionally coarser per-dim
  * resolution.
  */
object Layout {

  /** Inclusive clustering bounds for one dimension. Spans above 2^31
    * are refused: the fixed-point scale stays exact (and engine-
    * portable) only while `(x-min)*2^16` and the quotient round-trip
    * through IEEE doubles without ambiguity — for wider domains pass
    * quantile bounds, which also cluster better under skew. */
  final case class Bounds(min: Long, max: Long) {
    require(max >= min, s"empty bounds [$min, $max]")
    require(max - min + 1 <= (1L << 31), s"bounds span ${max - min + 1} exceeds 2^31; pass quantile bounds")
    def span: Long = max - min + 1
  }

  /** One aggregate scan → the dimension's min/max. Rows outside the
    * bounds (possible when bounds are reused across growing data) are
    * clamped to the edge cells by [[norm16]], so stale bounds degrade
    * clustering, never correctness. */
  def bounds(df: DataFrame, colName: String): Bounds = {
    val r = df.agg(
      min(col(colName)).cast("long").as("mn"),
      max(col(colName)).cast("long").as("mx")).head()
    Bounds(r.getLong(0), r.getLong(1))
  }

  /** Fixed-point scale into [0, 65535]: `((x-min) * 2^16) div span`,
    * clamped so rows outside stale bounds land on the edge cells
    * instead of corrupting the interleave. Exact for spans ≤ 2^31
    * (enforced by [[Bounds]]): numerator ≤ 2^47 is an exact double and
    * the true quotient is ≥ 2^-31 away from any integer it doesn't
    * equal, so floor-of-double == integer division. */
  private def norm16(c: Column, b: Bounds): Column = {
    val clamped = greatest(lit(b.min), least(lit(b.max), c.cast("long")))
    val scaled = (clamped - lit(b.min)) * lit(65536L)
    floor(scaled.cast("double") / lit(b.span.toDouble)).cast("long")
  }

  /** Spread the low 16 bits of `c` onto the even bit positions
    * (0,2,…,30) — the standard mask-shift Morton spread, four
    * shift-or-mask rounds, all whole-stage-codegen'd. */
  private def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value: `x`'s normalized bits on even positions, `y`'s on
    * odd — bit 2i+1,2i = (y_i, x_i), so the top 2k bits of z are the
    * top k bits of each dimension interleaved (a z-prefix IS a grid
    * cell). */
  def zvalue(x: Column, y: Column, bx: Bounds, by: Bounds): Column =
    spread16(norm16(x, bx)).bitwiseOR(shiftleft(spread16(norm16(y, by)), 1))

  /** Both dimensions' bounds in ONE aggregate scan — at 100 TB the
    * scan is the cost; never pay it per column. */
  def bounds2(df: DataFrame, xCol: String, yCol: String): (Bounds, Bounds) = {
    val r = df.agg(
      min(col(xCol)).cast("long").as("xmn"), max(col(xCol)).cast("long").as("xmx"),
      min(col(yCol)).cast("long").as("ymn"), max(col(yCol)).cast("long").as("ymx")).head()
    (Bounds(r.getLong(0), r.getLong(1)), Bounds(r.getLong(2), r.getLong(3)))
  }

  /** Attach a z-value column, computing both bounds from the data in
    * one aggregate scan; pass precomputed [[Bounds]] via [[zvalue]] to
    * skip it on repeated writes. */
  def withZValue(df: DataFrame, xCol: String, yCol: String, out: String = "__z"): DataFrame = {
    val (bx, by) = bounds2(df, xCol, yCol)
    df.withColumn(out, zvalue(col(xCol), col(yCol), bx, by))
  }

  /** The write-side layout op: range-partition on z into `nFiles`
    * output files, sort within each, drop the helper column. Each file
    * then covers one contiguous z-range — a bounded region of the 2-D
    * key space — so parquet footer min/max on BOTH columns is tight and
    * a predicate on either dimension skips most files. One exchange
    * (the range partitioner's sample pass rides the same scan Spark
    * always does for repartitionByRange). */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      nFiles: Int, mode: String = "overwrite"): Unit = {
    withZValue(df, xCol, yCol)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }
}
