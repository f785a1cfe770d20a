package graft.sources

import graft.{Q, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared conformance queries for the non-parquet source formats
  * (SURVEY §2.4: CSV/JSON "come free" with `spark.read` — these make the
  * claim oracle-checked instead of suite-only): a CUR-shaped fixture is
  * written in the format under test, read back, and run through the REAL
  * [[graft.etl.Normalize]] pipeline; DuckDB re-reads the same files with
  * its own reader and restates the normalize projection, so the hash
  * compare covers the format codec (quoting, escaping, type round-trip)
  * AND the transform.
  *
  * The service column deliberately contains commas and double quotes —
  * an RFC 4180 torture row per record. Spark's CSV writer is configured
  * with `escape="` so embedded quotes are doubled (RFC 4180), which is
  * the dialect DuckDB's sniffer expects; costs are exact quarters so the
  * text→double round-trip is bit-exact on both engines.
  *
  * Scale posture: format choice only changes the scan codec — the
  * normalize projection, pushdown and partitioning behavior are the
  * same lazy plan as the parquet path (CSV/JSON scans still prune
  * columns; they just can't skip row groups).
  */
object SourceQueries {

  private val syncTs = to_timestamp(lit("2024-06-01 00:00:00"))

  /** Fixture root, user-scoped: the oracle SQL must name the same path
    * the Spark side writes (it is dumped per-run into oracle_sql.json,
    * so a dynamic-but-deterministic path is safe), and a world-shared
    * /tmp name would collide across users on one host. */
  private val fixtureRoot: String = {
    val user = sys.props.getOrElse("user.name", "anon").replaceAll("[^A-Za-z0-9_]", "_")
    s"${sys.props("java.io.tmpdir")}/graft_${user}"
  }

  /** CUR-shaped rows derived from `nation` (25 rows, deterministic):
    * every mapped CUR column present, service carrying `, "..."`. */
  private def fixture(s: SparkSession, d: String): DataFrame =
    T.nation(s, d).select(
      concat(lit("2024-01-"),
        lpad(((col("n_nationkey") % 28) + 1).cast(StringType), 2, "0"),
        lit(" 10:30:00")).as("line_item_usage_start_date"),
      lpad(col("n_nationkey").cast(StringType), 12, "0")
        .as("line_item_usage_account_id"),
      concat(col("n_name"), lit(", \"svc\" "), col("n_regionkey").cast(StringType))
        .as("product_servicename"),
      lit("us-east-1").as("product_region"),
      (col("n_nationkey").cast(DoubleType) * 1.5 + 0.25)
        .as("line_item_unblended_cost"),
      lit("USD").as("line_item_currency_code"))

  /** CUR CSVs are stringly-typed; Normalize owns the casts. */
  private val csvSchema = StructType(Seq(
    StructField("line_item_usage_start_date", StringType),
    StructField("line_item_usage_account_id", StringType),
    StructField("product_servicename", StringType),
    StructField("product_region", StringType),
    StructField("line_item_unblended_cost", StringType),
    StructField("line_item_currency_code", StringType)))

  private def normalizeOracle(from: String, sourceTable: String): String =
    s"""SELECT CAST(CAST(line_item_usage_start_date AS TIMESTAMP) AS DATE) AS date,
        line_item_usage_account_id AS account_id,
        product_servicename AS service,
        product_region AS region,
        CAST(line_item_unblended_cost AS DOUBLE) AS cost,
        line_item_currency_code AS currency,
        'aws' AS cloud_provider, '$sourceTable' AS source_table,
        TIMESTAMP '2024-06-01 00:00:00' AS sync_timestamp
      FROM $from ORDER BY account_id"""

  // C38: CSV source → normalize. Fixed path so the static oracle SQL can
  // re-read the files DuckDB-side (Verify runs Spark first, so the
  // fixture exists when the oracle runs; overwrite keeps reruns clean).
  val c38 = Q(
    "c38_csv_source",
    (s, d) => {
      val dir = s"${fixtureRoot}_c38_csv"
      fixture(s, d).coalesce(1).write.mode("overwrite")
        .option("header", "true").option("escape", "\"").csv(dir)
      val back = s.read.schema(csvSchema)
        .option("header", "true").option("escape", "\"").csv(dir)
      graft.etl.Normalize.normalize(back, graft.etl.Normalize.awsCur, "csv_src", syncTs)
        .orderBy(col("account_id"))
    },
    Some(normalizeOracle(
      s"read_csv('${fixtureRoot}_c38_csv/*.csv', header=true, all_varchar=true)",
      "csv_src")))

  // C39: JSON-lines source → normalize. Same fixture, Spark's JSON writer
  // and DuckDB's read_json_auto on the other side.
  val c39 = Q(
    "c39_json_source",
    (s, d) => {
      val dir = s"${fixtureRoot}_c39_json"
      fixture(s, d).coalesce(1).write.mode("overwrite").json(dir)
      val back = s.read.schema(csvSchema).json(dir)
      graft.etl.Normalize.normalize(back, graft.etl.Normalize.awsCur, "json_src", syncTs)
        .orderBy(col("account_id"))
    },
    Some(normalizeOracle(
      s"""(SELECT line_item_usage_start_date, line_item_usage_account_id,
           product_servicename, product_region,
           CAST(line_item_unblended_cost AS VARCHAR) AS line_item_unblended_cost,
           line_item_currency_code
         FROM read_json_auto('${fixtureRoot}_c39_json/*.json'))""",
      "json_src")))

  // C53: ORC source → normalize. DuckDB has no ORC reader, so the
  // oracle cannot re-read the files — instead it restates the TYPED
  // fixture straight from `nation` and the hash compare proves the
  // Spark-side write→read round-trip preserved every value (timestamp
  // micros, doubles, strings) before the same normalize transform.
  // Unlike the stringly CSV/JSON fixtures this one is typed end-to-end:
  // ORC is self-describing, so the read side takes no schema and any
  // codec-level type drift (timestamp zone shear, double widening)
  // breaks the hash.
  private def typedFixture(s: SparkSession, d: String): DataFrame =
    T.nation(s, d).select(
      to_timestamp(concat(lit("2024-01-"),
        lpad(((col("n_nationkey") % 28) + 1).cast(StringType), 2, "0"),
        lit(" 10:30:00"))).as("line_item_usage_start_date"),
      lpad(col("n_nationkey").cast(StringType), 12, "0")
        .as("line_item_usage_account_id"),
      concat(col("n_name"), lit(" orc "), col("n_regionkey").cast(StringType))
        .as("product_servicename"),
      lit("us-east-1").as("product_region"),
      (col("n_nationkey").cast(DoubleType) * 1.5 + 0.25)
        .as("line_item_unblended_cost"),
      lit("USD").as("line_item_currency_code"))

  val c53 = Q(
    "c53_orc_roundtrip",
    (s, d) => {
      val dir = s"${fixtureRoot}_c53_orc"
      typedFixture(s, d).coalesce(1).write.mode("overwrite").orc(dir)
      val back = s.read.orc(dir)
      graft.etl.Normalize.normalize(back, graft.etl.Normalize.awsCur, "orc_src", syncTs)
        .orderBy(col("account_id"))
    },
    Some("""WITH src AS (SELECT
        CAST('2024-01-' || lpad(CAST(n_nationkey % 28 + 1 AS VARCHAR), 2, '0')
          || ' 10:30:00' AS TIMESTAMP) AS ts,
        lpad(CAST(n_nationkey AS VARCHAR), 12, '0') AS account_id,
        n_name || ' orc ' || CAST(n_regionkey AS VARCHAR) AS service,
        'us-east-1' AS region,
        CAST(n_nationkey AS DOUBLE) * 1.5 + 0.25 AS cost,
        'USD' AS currency
      FROM nation)
      SELECT CAST(ts AS DATE) AS date, account_id, service, region, cost,
        currency, 'aws' AS cloud_provider, 'orc_src' AS source_table,
        TIMESTAMP '2024-06-01 00:00:00' AS sync_timestamp
      FROM src ORDER BY account_id"""))

  val all: Seq[Q] = Seq(c38, c39, c53)
}
