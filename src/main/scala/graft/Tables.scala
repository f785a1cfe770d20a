package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated testdata tables (see TESTDATA.md /
  * FIXTURES.md §B) plus shared expression helpers used across the
  * conformance suite.
  *
  * Scale posture: every loader is a plain lazy parquet scan — Catalyst
  * pushes filters/projections down into the scan, so callers compose
  * freely without materializing anything.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def rd(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = rd(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = rd(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = rd(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = rd(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = rd(s, d, "part")
  // orders/lineitem are deliberately NOT ts-normalized: queries compare
  // their timestamp columns against literals, and Catalyst adapts the
  // LITERAL to the column's flavor — the column stays pristine and the
  // predicate pushes into the parquet scan. Routing them through
  // [[normalizeEventTs]] would wrap the column in a cast and lose the
  // pushdown (the 100 TB hot path). Flavor drift on a future testdata
  // regeneration is caught by TablesSpec's pinned-schema assertion
  // instead; events.ts needs the normalization because zoned-only
  // operations (unix_micros, withWatermark) reject NTZ outright.
  def orders(s: SparkSession, d: String): DataFrame    = rd(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = rd(s, d, "lineitem")

  /** Normalize an events-style `ts` column to a zoned `TimestampType`
    * across every parquet physical flavor the driver's generator has
    * produced (it regenerates testdata between rounds and has switched
    * layout at least once — round 11 broke three queries on exactly this):
    *
    *  - `LongType`: parquet TIMESTAMP(NANOS) read under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (Spark 4 rejects nanos
    *    outright otherwise), or a raw int64 epoch-nanos column. The data is
    *    µs-precision (epoch_ns % 1000 == 0 for every row) and `div` is
    *    integer division, so `timestamp_micros(ts div 1000)` is lossless —
    *    bit-for-bit how DuckDB reads the same column.
    *  - `TimestampNTZType`: parquet TIMESTAMP_MICROS(isAdjustedToUTC=0).
    *    Every session here runs `spark.sql.session.timeZone=UTC`
    *    (Bench/Verify/Main/SparkSpec), so `cast(TimestampType)` is a
    *    value identity — same epoch micros, now zoned, satisfying
    *    `unix_micros`/`withWatermark`.
    *  - `TimestampType`: TIMESTAMP_MICROS(isAdjustedToUTC=1) — passthrough.
    *
    * Works on batch and streaming frames alike (the stream sources pin
    * their schema from a batch probe of the same file). */
  def normalizeEventTs(df: DataFrame, c: String = "ts"): DataFrame =
    df.schema(c).dataType match {
      case LongType         => df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType =>
        // the NTZ→zoned cast reinterprets the wall-clock in the SESSION
        // timezone: value-preserving only under UTC. Fail loudly on a
        // misconfigured session instead of silently shifting every event.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"normalizeEventTs: casting a TIMESTAMP_NTZ '$c' to zoned requires " +
            s"spark.sql.session.timeZone=UTC (session has '$tz') — a non-UTC " +
            "session would shift every event timestamp by the zone offset")
        df.withColumn(c, col(c).cast(TimestampType))
      case TimestampType    => df
      case other => sys.error(
        s"events.$c has unsupported type $other — expected int64 nanos, " +
          "TIMESTAMP_NTZ micros, or zoned TIMESTAMP (testdata layout drift: " +
          "extend Tables.normalizeEventTs)")
    }

  /** events loader, robust to the parquet timestamp flavor (see
    * [[normalizeEventTs]]). If the file stores TIMESTAMP(NANOS) and the
    * session lacks `spark.sql.legacy.parquet.nanosAsLong=true`, the scan
    * itself throws at schema read — rethrown here with the fix spelled
    * out. This loader deliberately does NOT mutate the calling session's
    * conf: a conf flip here would be a surprise side effect for
    * concurrent sessions sharing the conf. */
  /** True when `e` (or a cause in its chain) is Spark's rejection of a
    * parquet TIMESTAMP(NANOS) column — the PARQUET_TYPE_ILLEGAL /
    * "Illegal Parquet type" analysis error. Matched narrowly so an
    * unrelated failure (missing file, permissions) propagates unmodified
    * instead of being misattributed to the legacy-conf issue. */
  private def isNanosTypeError(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists { t =>
      val m = Option(t.getMessage).getOrElse("")
      m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("Illegal Parquet type") ||
        m.contains("NANOS")
    }

  def events(s: SparkSession, d: String): DataFrame = {
    val raw =
      try rd(s, d, "events")
      catch {
        case e: Throwable
            if isNanosTypeError(e) &&
              s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true" =>
          throw new IllegalArgumentException(
            "events.parquet stores parquet TIMESTAMP(NANOS), which Spark 4 " +
              "rejects — build the session with " +
              "spark.sql.legacy.parquet.nanosAsLong=true " +
              "(Bench/Verify/Main/SparkSpec all do)", e)
      }
    normalizeEventTs(raw)
  }
  def documents(s: SparkSession, d: String): DataFrame = rd(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = rd(s, d, "embeddings")

  /** Register every table as a temp view (for spark.sql-driven flows). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n        => rd(spark, dir, n).createOrReplaceTempView(n)
    }
}

/** Expression helpers shared by the declared conformance queries.
  *
  * Float rule (SURVEY.md §2.3): testdata measures are DOUBLE and double
  * addition is order-dependent, so every declared aggregate casts to
  * DECIMAL(38,6) pre-sum (decimal addition is associative → the result is
  * independent of Spark's partitioning / DuckDB's scan order), then casts
  * the exact decimal sum back to DOUBLE for a stable output type.
  */
object Qh {
  val Dec: DecimalType = DecimalType(38, 6)

  /** Order-independent sum of a DOUBLE column, emitted as DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-independent mean: exact decimal sum ÷ count, both engines
    * compute the same IEEE double division. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType) / count(c)

  /** DuckDB-side spelling of [[dsum]]. */
  def oSum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(38,6))) AS DOUBLE)"

  /** DuckDB-side spelling of [[davg]]. */
  def oAvg(e: String): String = s"${oSum(e)} / COUNT($e)"
}
