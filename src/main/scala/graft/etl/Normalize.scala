package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The normalize transform — the heart of the reference pipeline
  * (reference src/transforms/normalize.py:44-109), re-expressed as a
  * single lazy projection.
  *
  * Semantics preserved exactly:
  *  - prioritized column resolution: primary source name, else the first
  *    present alternative (in declared list order), else a NULL column of
  *    the target type (normalize.py:71-90);
  *  - lenient casts: timestamp→date and numeric coercion are
  *    null-on-malformed (`try_cast`), mirroring pandas
  *    `errors="coerce"` (normalize.py:98-106) without giving up ANSI
  *    mode session-wide;
  *  - metadata literals `cloud_provider`, `source_table`,
  *    `sync_timestamp` (normalize.py:93-95).
  *
  * Scale posture: this is one narrow `select` over the scan — no shuffle,
  * no UDF, fully codegen'd, and column pruning means only the ≤6 resolved
  * source columns are read from parquet regardless of the raw table's
  * ~100-column width.
  */
object Normalize {

  /** Resolution spec for one target column. */
  final case class FieldSpec(target: String, primary: String, alternatives: Seq[String])

  /** The fixed 9-column normalized cost schema (normalize.py:11-21). */
  val targetColumns: Seq[String] = Seq(
    "date", "account_id", "service", "region", "cost", "currency",
    "cloud_provider", "source_table", "sync_timestamp")

  /** AWS CUR mapping: primaries normalize.py:24-31, alternatives
    * normalize.py:34-41. */
  val awsCur: Seq[FieldSpec] = Seq(
    FieldSpec("date", "line_item_usage_start_date",
      Seq("lineitem_usagestartdate", "usage_start_date")),
    FieldSpec("account_id", "line_item_usage_account_id",
      Seq("lineitem_usageaccountid", "usage_account_id", "bill_payeraccountid")),
    FieldSpec("service", "product_servicename",
      Seq("product_productname", "lineitem_productcode", "product_name")),
    FieldSpec("region", "product_region",
      Seq("product_location", "lineitem_availabilityzone")),
    FieldSpec("cost", "line_item_unblended_cost",
      Seq("lineitem_unblendedcost", "unblended_cost", "lineitem_blendedcost")),
    FieldSpec("currency", "line_item_currency_code",
      Seq("lineitem_currencycode", "currency_code")))

  /** Mapping used for the events-table mirror queries (C31/C32): the CUR
    * primaries are absent from `events`, so resolution exercises the
    * alternative path for date/account/service/cost and the NULL-fill
    * path for region/currency. */
  val eventsMirror: Seq[FieldSpec] = Seq(
    FieldSpec("date", "line_item_usage_start_date", Seq("usage_start_date", "ts")),
    FieldSpec("account_id", "line_item_usage_account_id", Seq("usage_account_id", "user_id")),
    FieldSpec("service", "product_servicename", Seq("product_name", "event_type")),
    FieldSpec("region", "product_region", Seq("product_location")),
    FieldSpec("cost", "line_item_unblended_cost", Seq("unblended_cost", "value")),
    FieldSpec("currency", "line_item_currency_code", Seq("currency_code")))

  /** Target output types for the string-typed slots. */
  private val stringTargets = Set("account_id", "service", "region", "currency")

  /** Resolve one spec against the input columns: primary, else first
    * present alternative, else NULL (normalize.py:71-90). */
  def resolve(spec: FieldSpec, present: Set[String]): Option[String] =
    (spec.primary +: spec.alternatives).find(present.contains)

  /** Build the typed output column for a spec. */
  private def outputCol(spec: FieldSpec, present: Set[String]): Column = {
    val src = resolve(spec, present)
    val raw = src.map(col).getOrElse(lit(null))
    val typed = spec.target match {
      // lenient date cast (normalize.py:98-102): try_cast never throws
      case "date" => src.map(c => expr(s"try_cast(`$c` AS DATE)")).getOrElse(lit(null).cast(DateType))
      // numeric coercion (normalize.py:105-106)
      case "cost" => src.map(c => expr(s"try_cast(`$c` AS DOUBLE)")).getOrElse(lit(null).cast(DoubleType))
      case t if stringTargets(t) => raw.cast(StringType)
      case _ => raw
    }
    typed.as(spec.target)
  }

  /** Project `df` to the fixed 9-column normalized schema (plus optional
    * passthrough columns, prepended — used by conformance queries that
    * need a deterministic order key). */
  def normalize(
      df: DataFrame,
      mapping: Seq[FieldSpec],
      sourceTable: String,
      // a Column so callers choose a fixed literal (replayable runs,
      // SURVEY §7.3.3) or current_timestamp(); parsed in session tz (UTC)
      syncTimestamp: Column,
      provider: String = "aws",
      passthrough: Seq[String] = Nil): DataFrame = {
    // Transform-side identifier cleaning BEFORE resolution (normalize.py:66):
    // raw CUR v1 headers like `lineItem/UsageStartDate` must resolve via
    // their cleaned form (`lineitem_usagestartdate`), not NULL-fill.
    // Collision-deduped (first wins): two headers cleaning to one name must
    // not make resolution throw an ambiguous-reference AnalysisException.
    val cleaned = df.toDF(Identifiers.cleanTransformColumns(df.columns.toSeq): _*)
    val present = cleaned.columns.toSet
    val resolved = mapping.map(outputCol(_, present))
    val meta = Seq(
      lit(provider).as("cloud_provider"),
      lit(sourceTable).as("source_table"),
      syncTimestamp.cast(TimestampType).as("sync_timestamp"))
    cleaned.select(passthrough.map(p => col(Identifiers.cleanTransform(p))) ++ resolved ++ meta: _*)
  }

  /** Empty-input short-circuit (normalize.py:59-60): an empty frame with
    * exactly the fixed output schema. */
  def emptyNormalized(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("date", DateType), StructField("account_id", StringType),
      StructField("service", StringType), StructField("region", StringType),
      StructField("cost", DoubleType), StructField("currency", StringType),
      StructField("cloud_provider", StringType), StructField("source_table", StringType),
      StructField("sync_timestamp", TimestampType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
