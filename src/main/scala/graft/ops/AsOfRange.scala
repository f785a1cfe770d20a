package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators the reference's SQL tier and
  * vanilla Spark both lack as primitives, re-expressed in shapes that
  * scale (SURVEY §2.5 preference order (a): compose existing ops).
  *
  * [[AsOfJoin.join]] — for each left row, the latest right row with
  * `right.ts <= left.ts` per key. NOT implemented as a non-equi join
  * (BNLJ, quadratic): both sides are tagged and unioned, one hash
  * shuffle on the key, one window pass carries the last right payload
  * forward — O(n log n) per key, exactly one exchange. This is the
  * standard distributed formulation of what DuckDB exposes natively as
  * `ASOF JOIN` (which serves as the conformance oracle).
  *
  * [[RangeJoin.banded]] — `left.value ∈ [right.lo, right.hi]` via
  * interval banding: each right interval is exploded onto the fixed-
  * width buckets it covers, left rows join on their single bucket, the
  * exact containment predicate filters residuals. Candidate pairs are
  * bounded by bucket co-residency — never the full cross product
  * (the same discipline as the LSH/MinHash candidate joins).
  */
object AsOfJoin {

  /** @param left      probe side; one output row per input row
    * @param right     state side supplying the as-of payload columns
    * @param key       equi-key column name present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param payload   right-side columns to carry (null when no right
    *                  row precedes the left row) */
  def join(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // right rows sort before left rows at the same timestamp → a right
    // row AT the left timestamp is visible (inclusive <=, ASOF default)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumns(payload.map(p => p -> lit(null)).toMap)
    val r = right
      .select(col(key) +: col(rightTs).as("__ts") +: payload.map(col): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(when(col("__side") === 0, col(p)), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).select((leftCols ++ payload).map(col): _*)
  }
}

object RangeJoin {

  /** Pairs where `left(valueCol)` lies in `[right(loCol), right(hiCol)]`.
    * `bucketWidth` should be ≥ the typical interval length so each
    * interval covers O(1) buckets. */
  def banded(
      left: DataFrame, right: DataFrame,
      valueCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame =
    banded(left, right, Nil, valueCol, loCol, hiCol, bucketWidth)

  /** [[banded]] with EQUI-KEYS: pairs where the sides agree on
    * `equiKeys` AND `left(valueCol) ∈ [right(loCol), right(hiCol)]` —
    * the per-entity range join (attribution windows, per-user session
    * joins). The band bucket simply joins ALONGSIDE the keys, so the
    * shuffle is one hash exchange on (keys, bucket) and candidate
    * pairs are bounded by per-(key, bucket) co-residency: when per-key
    * cardinalities are bounded (events per user), total pair count —
    * and therefore cost — is LINEAR in input size, unlike a keyless
    * range join over a fixed value domain, which is quadratic by
    * semantics (c35's 130M pairs at sf1). This is the range-join shape
    * that survives a 100× scale-up. */
  def banded(
      left: DataFrame, right: DataFrame, equiKeys: Seq[String],
      valueCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__bucket", floor(col(valueCol) / bucketWidth))
    val rb = right.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth), floor(col(hiCol) / bucketWidth))))
    lb.join(rb, equiKeys :+ "__bucket")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bucket")
  }
}
