package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The `costs` UNION ALL view over per-source normalized tables —
  * mirror of the reference's view generation
  * (reference src/transforms/normalize.py:112-143, src/main.py:124-132,
  * sql/init.sql:31-56).
  *
  * The reference emits `CREATE OR REPLACE VIEW` DDL text for PostgreSQL;
  * here the view lives in the Spark catalog and the union is by *name*
  * with missing columns allowed (SURVEY §7.3.6: schema drift across
  * loads → NULL-fill), which is strictly safer than the reference's
  * positional UNION ALL.
  *
  * Scale posture: a view over lazy unions costs nothing at definition
  * time; Catalyst pushes filters/projections through `Union` into each
  * branch's scan, so querying `costs` for one day touches one partition
  * of each source, not the whole lake.
  */
object CostsView {

  /** Columns the view exposes, positionally fixed (normalize.py:124-136). */
  val viewColumns: Seq[String] = Normalize.targetColumns

  /** Union normalized frames by name (missing columns → NULL), projected
    * to the fixed view schema. */
  def build(normalized: Seq[DataFrame]): DataFrame = {
    require(normalized.nonEmpty, "costs view needs at least one source")
    normalized
      .reduce(_.unionByName(_, allowMissingColumns = true))
      .select(viewColumns.map(col): _*)
  }

  /** Register the union of catalog tables `<t>_normalized` as view
    * `costs` (main.py:124-132 flow). */
  def create(spark: SparkSession, sourceTables: Seq[String], viewName: String = "costs"): DataFrame = {
    val dfs = sourceTables.map(t => spark.table(s"${t}_normalized"))
    val v = build(dfs)
    v.createOrReplaceTempView(viewName)
    v
  }

  /** Durable flavor of the serving contract: `CREATE OR REPLACE VIEW`
    * DDL over SQL-addressable table references (e.g. `parquet.`/path``),
    * matching the reference's persistent PG view (normalize.py:140-143).
    * The view definition lives in the session catalog — with a persistent
    * metastore it survives restarts; with the default in-memory catalog it
    * is session-scoped, but the DDL (and the parquet it points at) is the
    * same either way, so any catalog-backed serving tier gets the
    * reference's contract. */
  def createDurable(spark: SparkSession, tableRefs: Seq[String], viewName: String = "costs"): Unit = {
    require(tableRefs.nonEmpty, "costs view needs at least one source")
    // the name is interpolated into DDL — restrict to a plain identifier
    // (SURVEY §7.3.5: validated identifiers, no quoting surprises)
    require(viewName.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"view name must be a plain SQL identifier, got '$viewName'")
    // a leftover temp view with this name (e.g. from an earlier run that
    // used a non-SQL-addressable sink) would silently shadow the catalog
    // view for every reader — clear it so resolution hits the new DDL
    spark.catalog.dropTempView(viewName)
    val selects = tableRefs.map(r => s"SELECT ${viewColumns.mkString(", ")} FROM $r")
    spark.sql(s"CREATE OR REPLACE VIEW $viewName AS ${selects.mkString(" UNION ALL ")}")
  }
}
