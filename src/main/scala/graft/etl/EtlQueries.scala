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

  // D4: raw-table inspection through the real load path — events loaded
  // via ParquetLoader (overwrite = drop-create; loader-side identifier
  // cleaning; O17/O18), read back, LIMIT 10 (reference CLAUDE.md:92-93).
  val d04 = Q(
    "d04_raw_roundtrip",
    (s, d) => {
      // fixed user-scoped path + overwrite: repeated verify/bench
      // invocations reuse one directory instead of leaving a graft_d04*
      // dir per run, and the user scope avoids cross-user /tmp clashes
      val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft_d04_" + sys.props.getOrElse("user.name", "anon")
          .replaceAll("[^A-Za-z0-9_]", "_")).toString
      val loader = new ParquetLoader(out, "serve")
      loader.ensureNamespace()
      loader.load(T.events(s, d), "raw_events", "replace")
      loader.table(s, "raw_events").orderBy(col("event_id")).limit(10)
    },
    Some("""SELECT event_id, ts, user_id, event_type, value, props
      FROM events ORDER BY event_id LIMIT 10"""))

  private def at(iso: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  // D5: recent-sync monitoring — sync_log top-k newest-first (reference
  // sql/init.sql:12-24, DESC index). Fixed literal entries so the result
  // is declarable against a VALUES-based oracle.
  val d05 = Q(
    "d05_sync_log_recent",
    (s, _) => SyncLog.recent(SyncLog.toDf(s, Seq(
      SyncLog.Entry(at("2024-06-01T02:00:00Z"), "raw_cur_a", 120000L, "success", None, 42.5),
      SyncLog.Entry(at("2024-06-02T02:00:00Z"), "raw_cur_b", 98000L, "success", None, 38.1),
      SyncLog.Entry(at("2024-06-03T02:00:00Z"), "raw_cur_a", 0L, "error", Some("S3 timeout"), 3.2),
      SyncLog.Entry(at("2024-06-04T02:00:00Z"), "raw_cur_b", 101500L, "success", None, 40.0))), 3)
      // stored type is DECIMAL(10,2) (init.sql:19); serve as DOUBLE so the
      // driver's float compare sees both engines' native float path
      .withColumn("duration_seconds",
        org.apache.spark.sql.functions.col("duration_seconds")
          .cast(org.apache.spark.sql.types.DoubleType)),
    Some("""SELECT * FROM (VALUES
        (TIMESTAMP '2024-06-01 02:00:00', 'raw_cur_a', CAST(120000 AS BIGINT), 'success', CAST(NULL AS VARCHAR), 42.5),
        (TIMESTAMP '2024-06-02 02:00:00', 'raw_cur_b', CAST(98000 AS BIGINT), 'success', CAST(NULL AS VARCHAR), 38.1),
        (TIMESTAMP '2024-06-03 02:00:00', 'raw_cur_a', CAST(0 AS BIGINT), 'error', 'S3 timeout', 3.2),
        (TIMESTAMP '2024-06-04 02:00:00', 'raw_cur_b', CAST(101500 AS BIGINT), 'success', CAST(NULL AS VARCHAR), 40.0)
      ) AS t(sync_timestamp, source_name, rows_loaded, status, error_message, duration_seconds)
      ORDER BY sync_timestamp DESC, source_name LIMIT 3"""))

  // D6: the serving surface as literal SQL text against catalog views —
  // the reference's users query PostgreSQL with raw SQL (README.md:7,
  // 124-141); here the same statement runs through spark.sql on
  // registered temp views, proving the SQL front-end path end-to-end
  // (parse → analyze against catalog → optimize → execute).
  val d06 = Q(
    "d06_sql_serving",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT event_type AS service,
          CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
          COUNT(*) AS n
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        GROUP BY event_type
        ORDER BY total DESC, service""")
    },
    Some("""SELECT event_type AS service,
        CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
        COUNT(*) AS n
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      GROUP BY event_type
      ORDER BY total DESC, service"""))

  val all: Seq[Q] = Seq(c31, c32a, c32b, c32c, c33, d04, d05, d06)
}
