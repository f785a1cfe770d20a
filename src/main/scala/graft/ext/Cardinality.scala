package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-distinct cardinality over text corpora via the
  * deterministic KMV sketch ([[graft.functions.KmvDistinct]]).
  *
  * The reference's serving layer aggregates exactly over its costs
  * view (`/root/reference/sql/init.sql:31-56`, `README.md` serving
  * SQL) and has no approximate-distinct capability; at 100 TB the
  * exact distinct form shuffles every distinct value. This module is the bounded-state
  * path: per-group state is `k` longs, partial aggregation combines
  * map-side, and the shuffle carries at most `groups × k × 8` bytes.
  * Because KMV is deterministic given the hash, every number it emits
  * is restated exactly by the DuckDB oracle (window `row_number <= k`
  * over distinct md5-prefix hashes) — no tolerance band needed.
  */
object Cardinality {

  /** 2^60 as an exact double — the hash-space size of the 60-bit
    * `graft_portable_words` md5-prefix family (+1 shift moves the
    * range to [1, 2^60], keeping the estimator's divisor non-zero). */
  val HashSpace: Double = (1L << 60).toDouble

  /** The KMV estimate columns for a sketch column `s` built with
    * parameter `k`: `n_kmv` (how many of the k slots are filled),
    * `kth_min` (the k-th smallest hash, null-free since every group
    * has at least one token) and `est_distinct` — exact when the
    * group had fewer than k distinct values, else the unbiased
    * `(k-1) * |H| / h_k`. */
  private def estimate(s: Column, k: Int): Seq[Column] = Seq(
    size(s).cast("long").as("n_kmv"),
    element_at(s, -1).as("kth_min"),
    when(size(s) < k, size(s).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / element_at(s, -1).cast("double"))
      .as("est_distinct"))

  /** Distinct-token cardinality per group: single-space tokenize,
    * 60-bit md5-prefix hash per token (codegen'd, zero-allocation),
    * +1 shift, KMV-aggregate. The whole pre-aggregation front stays in
    * whole-stage codegen; the aggregate itself runs as an
    * ObjectHashAggregate with map-side partial sketches. */
  def kmvDistinctTokens(docs: DataFrame, groupCol: String, textCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(groupCol),
        explode(call_function("graft_portable_words", col(textCol))).as("h0"))
      .select(col(groupCol), (col("h0") + lit(1L)).as("h"))
      .groupBy(col(groupCol))
      .agg(call_function("graft_kmv", col("h"), lit(k)).as("kmv"))
      .select(col(groupCol) +: estimate(col("kmv"), k): _*)
  }
}
