package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit over a warehouse table — the
  * expectation checks every load pipeline runs before publishing
  * (Deequ/dbt-test semantics, re-expressed as plain Spark aggregates).
  * The reference pipeline loads CUR drops with no validation beyond
  * schema normalization (`src/etl/normalize.py`); an engine serving the
  * same warehouse needs the audit surface those loads feed.
  *
  * Every audit emits the same tiny frame: one row per check —
  * `(check_name, violations, total)` — so reports union freely and a
  * scheduler can gate a publish on `violations == 0`.
  *
  * Scale shape, per audit kind:
  *  - [[rowAudit]]: ALL row-level checks (null / range / set / custom
  *    predicate) evaluate in ONE scan — each check is a conditional
  *    count inside a single aggregate that combines map-side to one row
  *    per task; adding a check adds a column, never a pass.
  *  - [[uniqueAudit]]: two-phase distinct on the key columns — the
  *    exchange carries distinct keys only, the standard COUNT DISTINCT
  *    plan; never collects keys anywhere.
  *  - [[refAudit]]: LEFT ANTI join from fact foreign keys to the
  *    dimension's primary key; AQE broadcasts the dim side when it
  *    fits (the usual case — dims are small), otherwise a key-hash
  *    exchange. NULL FKs are excluded (that's [[notNull]]'s job).
  *
  * The 1-row audit frames union into a ≤ |checks|-row report — driver
  * cost is zero regardless of table size.
  */
object DataQuality {

  /** A row-level expectation: `violation` is TRUE on rows that break it. */
  final case class RowCheck(name: String, violation: Column)

  /** Column must never be NULL. */
  def notNull(c: String): RowCheck =
    RowCheck(s"not_null:$c", col(c).isNull)

  /** Non-null values must lie in [lo, hi] (nulls are [[notNull]]'s job). */
  def inRange(c: String, lo: Double, hi: Double): RowCheck =
    RowCheck(s"in_range:$c", col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** Non-null values must be one of `allowed`. */
  def inSet(c: String, allowed: Seq[String]): RowCheck =
    RowCheck(s"in_set:$c", col(c).isNotNull && !col(c).isin(allowed: _*))

  /** All row-level checks in one scan: a single aggregate computes the
    * total and every check's conditional count, then unpivots to the
    * report shape. The unpivot is typed Columns (explode over an array
    * of structs), never spliced SQL — a check NAME containing a quote
    * or backslash is carried as data, not parsed (string-built `stack`
    * would silently mangle `'`-containing names: Spark's lexer escapes
    * with backslashes, not doubled quotes). */
  def rowAudit(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "DataQuality.rowAudit: checks must be non-empty")
    val aggs = count(lit(1)).as("total") +:
      checks.zipWithIndex.map { case (c, i) =>
        sum(when(c.violation, 1L).otherwise(0L)).as(s"v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(
        explode(array(checks.zipWithIndex.map { case (c, i) =>
          struct(lit(c.name).as("check_name"), col(s"v$i").as("violations"))
        }: _*)).as("kv"),
        col("total"))
      .select(col("kv.check_name").as("check_name"),
        col("kv.violations").as("violations"), col("total"))
  }

  /** Key columns must identify rows: violations = rows beyond the first
    * per key (`total − distinct keys`). Keys are compared as a STRUCT,
    * so NULL key fields compare equal to each other (GROUP BY
    * semantics, and DuckDB's `COUNT(DISTINCT (a,b))`) — a bare
    * multi-column `count_distinct` would DROP every NULL-containing
    * tuple from the distinct count and report unique NULL-keyed rows
    * as duplicates. */
  def uniqueAudit(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "DataQuality.uniqueAudit: keys must be non-empty")
    df.agg(count(lit(1)).as("total"),
        count_distinct(struct(keys.map(col): _*)).as("dk"))
      .select(lit(s"unique:${keys.mkString(",")}").as("check_name"),
        (col("total") - col("dk")).as("violations"), col("total"))
  }

  /** Every non-null FK must resolve in the dimension: violations =
    * orphan fact rows. */
  def refAudit(fact: DataFrame, fk: String, dim: DataFrame, pk: String): DataFrame = {
    val orphans = fact.select(col(fk)).filter(col(fk).isNotNull)
      .join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = fact.agg(count(lit(1)).as("total"))
    orphans.crossJoin(total)
      .select(lit(s"ref:$fk->$pk").as("check_name"), col("violations"), col("total"))
  }

  /** Union a set of audit frames into one report, deterministically
    * ordered by check name. */
  def report(audits: Seq[DataFrame]): DataFrame = {
    require(audits.nonEmpty, "DataQuality.report: audits must be non-empty")
    audits.reduce(_.unionByName(_)).orderBy(col("check_name"))
  }
}
