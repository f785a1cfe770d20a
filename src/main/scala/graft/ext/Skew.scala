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
}
