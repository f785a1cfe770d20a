package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §7.3.7 / the 100 TB posture).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`, on by default
  * in the engine sessions) handles most cases at runtime. Salting is
  * the explicit fallback for the pathological shape AQE can't fix: a
  * single join key so hot that one task would still receive it whole
  * (e.g. a null-ish default account id owning half the fact table).
  *
  * [[saltedJoin]] splits every hot key's rows across `factor` synthetic
  * sub-keys on the big side and replicates the small side `factor`
  * times, so the hot key becomes `factor` parallel tasks. The salt is
  * derived deterministically from the whole row (xxhash64), keeping
  * runs replayable. Result equality with the plain join is asserted in
  * the test suite.
  */
object Skew {

  /** Deterministic per-row salt in [0, factor). */
  private def rowSalt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(factor.toLong)).cast("int")

  /** Equi-join `big ⋈ small` on `keys`, with the big side's rows spread
    * over `factor` salted sub-keys. Semantics identical to
    * `big.join(small, keys, joinType)` for inner/left joins on unique
    * small-side keys. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      factor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = big.withColumn("__salt", rowSalt(big, factor))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Top-N heaviest keys with counts — the diagnosis step: run this on
    * a sample before deciding a key needs salting. */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
      .limit(topN)

  /** Sketch-measured key-distribution shape.
    *
    * `skewRatio = F2_est · D_est / n²`: a uniform bag of D keys has
    * `F2 = n²/D`, so the ratio reads ~1.0 for uniform keys and grows
    * with mass concentration (a single hot key owning half the rows
    * pushes it toward D/4). The decision input [[autoSaltedJoin]]
    * thresholds on. */
  final case class SkewStats(nRows: Long, distinctEst: Double, f2Est: Double) {
    def skewRatio: Double =
      if (nRows == 0L) 1.0
      else f2Est * distinctEst / (nRows.toDouble * nRows.toDouble)
  }

  /** ONE-SCAN skew measurement: the KMV distinct sketch and the AMS F2
    * estimator computed in a single aggregate over `key` — at 100 TB
    * this is the whole diagnosis (bounded state, map-side merged,
    * one row collected), where [[keyHistogram]]'s exact groupBy is
    * the full per-key shuffle it exists to avoid. */
  def measure(df: DataFrame, key: String, k: Int = 256): SkewStats = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rows = df.filter(col(key).isNotNull)
    val keyStr = col(key).cast("string")
    def slice(r: Int): Column =
      conv(substring(md5(keyStr), 1 + 8 * r, 8), 16, 10).cast("long")
    val signSums = Cardinality.AmsEstimators.map { case (r, b) =>
      sum(lit(1L) - lit(2L) * (shiftright(slice(r), b) % 2)).as(s"s_${r}_$b")
    }
    val aggs = Seq(
      count(lit(1)).as("n"),
      call_function("graft_kmv",
        Cardinality.portableStringHash(col(key)), lit(k)).as("kmv")) ++ signSums
    val row = rows.agg(aggs.head, aggs.tail: _*).collect().head
    val n = row.getAs[Long]("n")
    val sketch = row.getAs[scala.collection.Seq[Long]]("kmv")
    val dEst =
      if (sketch.size < k) sketch.size.toDouble
      else (k - 1).toDouble * Cardinality.HashSpace / sketch.last.toDouble
    val f2 = Cardinality.AmsEstimators.map { case (r, b) =>
      val s = row.getAs[Long](s"s_${r}_$b"); s.toDouble * s.toDouble
    }.sum / Cardinality.AmsEstimators.size
    SkewStats(n, dEst, f2)
  }

  /** The measured join decision: sketch the big side's key shape in
    * one pass, then join PLAIN when the distribution reads uniform and
    * SALTED when `skewRatio >= threshold` — statistics feeding the
    * physical plan the way an optimizer's column stats would, with the
    * measurement itself bounded however big the table. Returns the
    * frame plus the stats and the decision so callers can log it. */
  def autoSaltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      threshold: Double = 4.0,
      factor: Int = 16,
      joinType: String = "inner"): (DataFrame, SkewStats, Boolean) = {
    val stats = measure(big, key)
    val salt = stats.skewRatio >= threshold
    val joined =
      if (salt) saltedJoin(big, small, Seq(key), factor, joinType)
      else big.join(small, Seq(key), joinType)
    (joined, stats, salt)
  }
}
