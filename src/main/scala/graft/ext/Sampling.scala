package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus sampling and statistics for training-data pipelines
  * (SURVEY §2.5 E-suite extensions).
  *
  * Sampling here is HASH-BASED, not RNG-based: a row is kept iff the
  * engine-neutral hash of its id falls under the rate threshold. That is
  * the reproducible-sampling pattern real training pipelines use —
  * the same rows are selected on every run, every engine, every
  * partitioning (RNG sampling depends on partition layout and seed
  * plumbing), membership is stable under incremental reprocessing, and
  * an external engine can replay the selection exactly (so the driver
  * oracle-checks it). Map-only: the filter rides the scan.
  */
object Sampling {

  /** Keep a row iff hash(id) mod 1000 < permille — deterministic,
    * engine-neutral ([[Dedup.portableHash24]]). */
  def hashKeep(idCol: Column, permille: Column): Column =
    Dedup.portableHash24(idCol.cast(StringType)) % 1000 < permille

  /** Uniform deterministic sample at `permille`/1000 rate. */
  def hashSample(df: DataFrame, idCol: String, permille: Int): DataFrame =
    df.filter(hashKeep(col(idCol), lit(permille)))

  /** Stratified deterministic sample: per-stratum rates (‰) with a
    * default for unlisted strata — the "data mixing" step that
    * up/down-weights sources into a training blend. */
  def stratifiedHashSample(
      df: DataFrame, idCol: String, strataCol: String,
      permille: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = permille.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashKeep(col(idCol), rate))
  }

  /** Per-stratum length statistics: count, mean (decimal-exact then
    * divided, order-independent — the suite's float rule), and exact
    * interpolated percentiles. Exact `percentile` sorts per group —
    * at 100 TB switch to `percentile_approx` when a bounded error is
    * acceptable; declared exact so the external oracle can match it. */
  def lengthStats(df: DataFrame, strataCol: String, textCol: String,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val n = length(col(textCol))
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      (sum(n.cast(DecimalType(38, 6))).cast(DoubleType) / count(n)).as("mean_len")) ++
      ps.map(p => call_function("percentile", n, lit(p)).as(s"p${(p * 100).round}"))
    require(ps.map(p => (p * 100).round).distinct.size == ps.size,
      s"percentile labels collide: $ps")
    df.groupBy(col(strataCol)).agg(aggs.head, aggs.tail: _*)
  }
}
