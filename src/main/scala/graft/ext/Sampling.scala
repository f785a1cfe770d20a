package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Exact per-stratum cap: keep the `cap` rows with the smallest
    * engine-neutral hash in each stratum — the domain-balancing step
    * that bounds an over-represented source at an exact row count
    * ([[stratifiedHashSample]] bounds it only in expectation). The
    * hash order is pseudorandom w.r.t. every corpus attribute but
    * identical on every run and engine, and the kept set is a prefix:
    * raising the cap only adds rows, so incremental re-mixes are
    * supersets. Ties (24-bit hash collisions) break on the id, so the
    * selection is total.
    *
    * Shape: ONE shuffle on the stratum; Spark's window sort is
    * external (spills), so a dominant stratum is bounded by disk, not
    * heap. At 100 TB with a stratum many orders larger than `cap`,
    * pre-filter with the expectation-rate [[stratifiedHashSample]] at
    * a couple of times the cap's rate before the exact rank, so the
    * per-stratum sort sees O(cap) rows instead of the full stratum. */
  def capPerStratum(df: DataFrame, idCol: String, strataCol: String,
      cap: Int): DataFrame = {
    val h = Dedup.portableHash24(col(idCol).cast(StringType))
    df.withColumn("rank_in_stratum",
        row_number().over(Window.partitionBy(col(strataCol)).orderBy(h, col(idCol)))
          .cast(LongType))
      .filter(col("rank_in_stratum") <= cap)
  }

  /** Deterministic global shuffle: place every row at a reproducible
    * (shard, pos) — the "shuffle once, write N training shards" step
    * at the end of a corpus pipeline. `shard = hash(id) % nShards`
    * spreads rows uniformly; `pos` orders a shard by the same hash
    * (id tiebreak), so consumption order is pseudorandom w.r.t. any
    * corpus attribute (source, date, length) yet bit-identical across
    * runs and engines — the property training-data loaders need for
    * resumable, reproducible epochs.
    *
    * ONE shuffle on the shard; the within-shard sort rides the window
    * partition. A writer pipeline uses the same two keys as
    * `repartition(nShards, shard) + sortWithinPartitions(h, id)` —
    * same exchange, no rank materialized. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val h = Dedup.portableHash24(col(idCol).cast(StringType))
    df.withColumn("shard", (h % nShards).cast(IntegerType))
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(h, col(idCol)))
          .cast(LongType))
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
