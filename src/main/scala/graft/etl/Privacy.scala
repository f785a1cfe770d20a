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
  * is scanned once and never shuffled. On a partitioned warehouse,
  * [[forgetInWarehouse]] executes the purge partition-pruned: only
  * partitions containing subject rows are re-read (static pruning
  * predicate) and rewritten (dynamic partition overwrite), with
  * fully-purged partitions dropped explicitly — untouched partitions
  * keep their exact bytes (spec-asserted). Masking is map-only — pure
  * projection, no exchange at any size.
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

  /** The partition-membership predicate: does this row's partition-key
    * tuple appear in `parts`? ONE `In` over a struct of the partition
    * columns — flat at ANY affected-partition count (the optimizer
    * converts long literal lists to a set lookup), where a per-partition
    * OR-chain would plan a thousand-term predicate tree for a thousand
    * partitions. Struct equality compares fields null-safely, so a NULL
    * partition value matches its own partition (a bare `===` would
    * silently never match NULL — rows neither purged nor audited).
    * References only partition columns → static partition pruning. */
  private[etl] def partitionMembership(
      partitionCols: Seq[String], parts: Seq[Seq[(String, String)]]): Column = {
    val key = struct(partitionCols.map(c => col(c).cast("string")): _*)
    // align each spec BY NAME against partitionCols — a positionally
    // shuffled spec would otherwise match values against the wrong
    // columns (rows neither purged nor audited), silently
    key.isin(parts.map { kvs =>
      val byName = kvs.toMap
      require(byName.size == kvs.size && partitionCols.forall(byName.contains),
        s"Privacy.partitionMembership: spec keys ${kvs.map(_._1).mkString(",")} " +
          s"must cover partition columns ${partitionCols.mkString(",")} exactly once")
      struct(partitionCols.map(c => lit(byName(c)).cast("string")): _*)
    }: _*)
  }

  /** Execute a right-to-be-forgotten purge AGAINST the partitioned
    * parquet warehouse, touching only the partitions that contain
    * subject rows — the partition-pruned rewrite a 100 TB table
    * requires (rewriting the whole table to delete 0.01% of rows
    * inverts the op's purpose). Steps:
    *
    *  1. find the partitions holding subject rows (broadcast semi
    *     join, collected — bounded by the table's partition count, the
    *     same contract as [[ParquetLoader.retention]]);
    *  2. re-read ONLY those partitions ([[partitionMembership]] — a
    *     single set-membership predicate on the partition columns:
    *     STATIC partition pruning in the scan, plan size O(1) in the
    *     affected-partition count, NULL partition values included),
    *     anti-join the subjects out, and write back through dynamic
    *     partition overwrite (`upsert_partitions`) — untouched
    *     partitions keep their exact bytes;
    *  3. partitions whose every row was a subject's end up ABSENT from
    *     the written frame — dynamic overwrite would silently leave
    *     them, so they are dropped explicitly
    *     ([[ParquetLoader.dropPartitions]], which Hive-escapes values
    *     and maps NULL to the default-partition dir name, so escaped
    *     and NULL partitions really come off the disk).
    *
    * Returns the per-partition audit (kept/purged counts over the
    * affected partitions; untouched partitions don't appear — nothing
    * about them changed). */
  def forgetInWarehouse(
      spark: org.apache.spark.sql.SparkSession,
      loader: ParquetLoader,
      table: String,
      subjects: DataFrame,
      keyCol: String,
      partitionCols: Seq[String]): DataFrame = {
    require(partitionCols.nonEmpty, "Privacy.forgetInWarehouse: table must be partitioned")
    val subj = broadcast(subjects.select(col(keyCol)).distinct())
    val full = loader.table(spark, table)
    val hot = full.join(subj, Seq(keyCol), "left_semi")
      .select(partitionCols.map(c => col(c).cast("string").as(c)): _*)
      .distinct().collect()
      .map(r => partitionCols.map(c => c -> r.getAs[String](c)))
    if (hot.isEmpty)
      return full.limit(0).select(lit("").as("bucket"),
        lit(0L).as("n_kept"), lit(0L).as("n_purged"))
    val hotScan = loader.table(spark, table)
      .filter(partitionMembership(partitionCols, hot.toIndexedSeq))
    val audit = forgetAudit(hotScan, subjects, keyCol,
      concat_ws("/", partitionCols.map(c =>
        concat(lit(c + "="), coalesce(col(c).cast("string"), lit("null")))): _*))
      .orderBy(col("bucket"))
      // materialize BEFORE the rewrite mutates the partitions under it
      .localCheckpoint(eager = true)
    val purged = hotScan.join(subj, Seq(keyCol), "left_anti")
      // survivors, re-read eagerly for the same reason
      .localCheckpoint(eager = true)
    val surviving = purged
      .select(partitionCols.map(c => col(c).cast("string").as(c)): _*).distinct().collect()
      .map(r => partitionCols.map(c => c -> r.getAs[String](c))).toSet
    if (!purged.isEmpty) { loader.load(purged, table, "upsert_partitions", partitionCols); () }
    loader.dropPartitions(spark, table, hot.toSeq.filterNot(surviving.contains))
    audit
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
