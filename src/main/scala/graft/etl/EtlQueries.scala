package graft.etl

import graft.{Q, Qh, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ETL-pipeline mirror queries C31–C33 + the documented serving queries
  * D1–D3 (SURVEY.md §2.2/§2.3) — the reference pipeline itself, run
  * through the real `Normalize`/`CostsView` modules and checked against
  * a DuckDB oracle that restates the same semantics in plain SQL.
  */
object EtlQueries {
  import Qh._

  private val syncTs = to_timestamp(lit("2024-06-01 00:00:00"))

  /** The C32 costs view: two normalized event slices unioned — the
    * reference's multi-source `costs` view in miniature. */
  private def costs(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d)
    val a = Normalize.normalize(ev.filter(col("event_type") === "click"),
      Normalize.eventsMirror, "events_click", syncTs)
    val b = Normalize.normalize(ev.filter(col("event_type") === "purchase"),
      Normalize.eventsMirror, "events_purchase", syncTs)
    CostsView.build(Seq(a, b))
  }

  private val costsOracleFrom =
    """(SELECT event_type AS service, CAST(user_id AS VARCHAR) AS account_id,
        value AS cost, CAST(ts AS DATE) AS date FROM events
        WHERE event_type IN ('click', 'purchase'))"""

  // C31: normalize mirror — fallback resolution (primary absent →
  // alternative taken; region/currency unresolvable → NULL), metadata
  // literals, lenient casts; event_id passed through as the order key.
  val c31 = Q(
    "c31_normalize_mirror",
    (s, d) => Normalize.normalize(T.events(s, d), Normalize.eventsMirror,
      "events", syncTs, passthrough = Seq("event_id"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id, CAST(ts AS DATE) AS date,
        CAST(user_id AS VARCHAR) AS account_id, event_type AS service,
        CAST(NULL AS VARCHAR) AS region, CAST(value AS DOUBLE) AS cost,
        CAST(NULL AS VARCHAR) AS currency, 'aws' AS cloud_provider,
        'events' AS source_table, TIMESTAMP '2024-06-01 00:00:00' AS sync_timestamp
      FROM events ORDER BY event_id"""))

  // C32a = D1 shape: total cost by service over a date window (fixed
  // literal anchor, README.md:125-130).
  val c32a = Q(
    "c32_costs_by_service",
    (s, d) => costs(s, d)
      .filter(col("date") >= lit("2024-01-10").cast("date"))
      .groupBy(col("service"))
      .agg(dsum(col("cost")).as("total"))
      .orderBy(col("total").desc, col("service")),
    Some(s"""SELECT service, ${oSum("cost")} AS total FROM $costsOracleFrom
      WHERE date >= DATE '2024-01-10'
      GROUP BY service ORDER BY total DESC, service"""))

  // C32b = D2 shape: cost by account (README.md:133-135).
  val c32b = Q(
    "c32_costs_by_account",
    (s, d) => costs(s, d)
      .groupBy(col("account_id"))
      .agg(dsum(col("cost")).as("total"), count(lit(1)).as("n"))
      .orderBy(col("account_id")),
    Some(s"""SELECT account_id, ${oSum("cost")} AS total, COUNT(*) AS n
      FROM $costsOracleFrom GROUP BY account_id ORDER BY account_id"""))

  // C32c = D3 shape: daily trend (README.md:138-141).
  val c32c = Q(
    "c32_costs_daily",
    (s, d) => costs(s, d)
      .groupBy(col("date"))
      .agg(dsum(col("cost")).as("total"))
      .orderBy(col("date")),
    Some(s"""SELECT date, ${oSum("cost")} AS total FROM $costsOracleFrom
      GROUP BY date ORDER BY date"""))

  // C33: partition-prune mirror (O3) — a one-month window expressed as a
  // timestamp predicate, daily decimal sums.
  val c33 = Q(
    "c33_partition_prune",
    (s, d) => CurSource.windowed(T.events(s, d), "ts",
      "2024-01-01", "2024-02-01")
      .groupBy(col("ts").cast("date").as("d"))
      .agg(dsum(col("value")).as("total"))
      .orderBy(col("d")),
    Some(s"""SELECT CAST(ts AS DATE) AS d, ${oSum("value")} AS total FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
      GROUP BY d ORDER BY d"""))

  val all: Seq[Q] = Seq(c31, c32a, c32b, c32c, c33)
}
