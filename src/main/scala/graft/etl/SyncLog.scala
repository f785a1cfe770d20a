package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run-observability log — mirror of the reference's `sync_log` table
  * (reference sql/init.sql:12-24): one row per source per run, appended,
  * served most-recent-first (the DESC index at init.sql:22-24 = the D5
  * monitoring query).
  */
object SyncLog {

  final case class Entry(
      sync_timestamp: java.sql.Timestamp,
      source_name: String,
      rows_loaded: Long,
      status: String,
      error_message: Option[String],
      duration_seconds: Double)

  val tableName = "sync_log"

  def toDf(spark: SparkSession, entries: Seq[Entry]): DataFrame = {
    import spark.implicits._
    // duration_seconds is DECIMAL(10,2) in the reference's DDL
    // (sql/init.sql:19) — type the stored column the same way.
    entries.toDF().withColumn("duration_seconds",
      col("duration_seconds").cast(org.apache.spark.sql.types.DecimalType(10, 2)))
  }

  /** Append run entries (init.sql's INSERT path; if_exists="append"). */
  def append(spark: SparkSession, loader: Loader, entries: Seq[Entry]): Long =
    if (entries.isEmpty) 0L
    else loader.load(toDf(spark, entries), tableName, ifExists = "append")

  /** D5: most recent syncs first (mirrors idx_sync_log_timestamp DESC). */
  def recent(log: DataFrame, k: Int): DataFrame =
    log.orderBy(col("sync_timestamp").desc, col("source_name")).limit(k)
}
