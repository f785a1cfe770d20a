package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operations over warehouse tables: right-to-be-forgotten
  * deletion with a propagation audit, and deterministic column masking
  * policies — the governance surface a pipeline holding user-keyed
  * events legally needs (the reference stores raw account-keyed cost
  * rows with no deletion or masking path at all; its loader can only
  * overwrite whole tables). Composes with [[Cdc]] (a forget is a
  * tombstone burst) and [[DataQuality]] (audit frames share the
  * report-shape idea).
  *
  * Scale shape: the subject list (users exercising deletion) is tiny
  * relative to the fact table — every operation here joins fact rows
  * against a BROADCAST of the distinct subject keys, so the fact table
  * is scanned once and never shuffled. On a partitioned warehouse the
  * rewrite touches only partitions containing subject rows (the
  * partition-pruned upsert path of [[ParquetLoader]]'s
  * `upsert_partitions` mode); masking is map-only — pure projection,
  * no exchange at any size.
  */
object Privacy {

  /** Rows of `df` with every subject's rows removed — LEFT ANTI against
    * the broadcast distinct subject keys. */
  def forget(df: DataFrame, subjects: DataFrame, keyCol: String): DataFrame =
    df.join(broadcast(subjects.select(col(keyCol)).distinct()), Seq(keyCol), "left_anti")

  /** The deletion audit: per `groupCol` bucket (a day, a partition, a
    * table), rows kept vs rows purged — the evidence trail a deletion
    * request requires. One scan: each row is tagged by a broadcast
    * LEFT SEMI membership flag and counted conditionally. */
  def forgetAudit(
      df: DataFrame, subjects: DataFrame, keyCol: String, groupCol: Column): DataFrame = {
    val keys = broadcast(subjects.select(col(keyCol)).distinct()
      .withColumn("_is_subject", lit(1)))
    df.join(keys, Seq(keyCol), "left")
      .groupBy(groupCol.as("bucket"))
      .agg(
        sum(when(col("_is_subject").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_is_subject").isNotNull, 1L).otherwise(0L)).as("n_purged"))
  }

  /** Deterministic pseudonymization: salted SHA-256 hex of the value.
    * Same input + salt → same token, so joins/grouping on the masked
    * column still work across tables masked with the same salt, while
    * the raw value never leaves the scan. NULL stays NULL. */
  def pseudonymize(c: Column, salt: String): Column =
    when(c.isNull, lit(null).cast("string"))
      .otherwise(sha2(concat(lit(salt), lit("|"), c.cast("string")), 256))

  /** Numeric generalization: values floored to `width`-sized buckets —
    * k-anonymity-style coarsening that keeps aggregates meaningful.
    * Pure elementwise IEEE arithmetic, identical on any engine. */
  def generalize(c: Column, width: Double): Column =
    floor(c / lit(width)) * lit(width)
}
