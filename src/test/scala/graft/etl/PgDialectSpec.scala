package graft.etl

import java.sql.Types

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PG-dialect wire-grammar coverage for the JDBC loader (VERDICT r6
  * item 4). No PostgreSQL server/driver nor H2 jar exists offline, so
  * the three overwrite paths run against [[FakePg]]: a `jdbc:postgresql:`
  * URL resolves Spark's REAL PostgresDialect (type mapping, quoting,
  * truncate/cascade semantics) and every statement that would reach the
  * wire is captured and asserted against the reference's PG contract
  * (reference src/loaders/postgresql.py:77-107, sql/init.sql).
  *
  * Dialect matrix (execution vs grammar):
  * | path                        | Derby (executed)    | PG (grammar-captured)      |
  * |-----------------------------|---------------------|----------------------------|
  * | namespace                   | CREATE SCHEMA       | CREATE SCHEMA              |
  * | same-schema overwrite       | TRUNCATE TABLE      | TRUNCATE TABLE ONLY        |
  * | schema-change overwrite     | plain DROP fallback | DROP TABLE ... CASCADE     |
  * | nullability tightening      | drop-and-recreate   | drop-and-recreate          |
  * | DDL types                   | JdbcUtils defaults  | TEXT/FLOAT8/DATE/TIMESTAMP |
  * | append                      | INSERT batched      | INSERT, quoted identifiers |
  * LoaderSpec executes the left column end-to-end on Derby; this spec
  * pins the right column's exact SQL text.
  */
class PgDialectSpec extends SparkSpec {
  import FakePg.Col

  private def costsDf = {
    import spark.implicits._
    Seq(("2024-01-05", "123456789012", "AmazonEC2", 1.25))
      .toDF("date", "account_id", "service", "cost")
      .select(col("date").cast("date"), col("account_id"), col("service"), col("cost"))
  }

  private def matchingCols(nullable: Boolean = true) = Seq(
    Col("date", Types.DATE, "date", nullable),
    Col("account_id", Types.VARCHAR, "text", nullable),
    Col("service", Types.VARCHAR, "text", nullable),
    Col("cost", Types.DOUBLE, "float8", nullable))

  private def newLoader() = {
    FakePg.register
    FakePg.reset()
    new JdbcLoader(FakePg.url, "user", "pw", "s")
  }

  test("PG grammar: namespace + same-schema overwrite TRUNCATEs (no DROP)") {
    val ld = newLoader()
    ld.ensureNamespace()
    assert(FakePg.recorded.contains("CREATE SCHEMA s"), FakePg.recorded.mkString("\n"))
    FakePg.seed("s.costs", matchingCols())
    ld.load(costsDf, "costs", "replace")
    val sql = FakePg.recorded
    assert(sql.exists(_.startsWith("TRUNCATE TABLE ONLY s.costs")),
      s"expected PostgresDialect truncate, got:\n${sql.mkString("\n")}")
    assert(!sql.exists(_.toUpperCase.startsWith("DROP TABLE")),
      s"dependent views must survive a same-schema refresh:\n${sql.mkString("\n")}")
    // the batched insert uses PG-quoted identifiers
    assert(sql.exists(s => s.startsWith("INSERT INTO s.costs") && s.contains("\"cost\"")),
      sql.mkString("\n"))
  }

  test("PG grammar: schema-change overwrite drops CASCADE and recreates with PG types") {
    val ld = newLoader()
    // existing cost column is TEXT; incoming frame has DOUBLE -> drop path
    FakePg.seed("s.costs", matchingCols().map(c =>
      if (c.name == "cost") Col("cost", Types.VARCHAR, "text", nullable = true) else c))
    ld.load(costsDf, "costs", "replace")
    val sql = FakePg.recorded
    assert(sql.contains("DROP TABLE s.costs CASCADE"),
      s"reference contract is DROP ... CASCADE (postgresql.py:77-79):\n${sql.mkString("\n")}")
    val create = sql.find(_.startsWith("CREATE TABLE s.costs"))
      .getOrElse(fail(s"no CREATE TABLE captured:\n${sql.mkString("\n")}"))
    // the dialect's dtype map mirrors the reference's pandas->PG map
    // (postgresql.py:125-140): float64->DOUBLE PRECISION (FLOAT8 is PG's
    // canonical alias), object->TEXT, datetime64->TIMESTAMP, plus DATE
    assert(create.contains("\"cost\" FLOAT8"), create)
    assert(create.contains("\"service\" TEXT"), create)
    assert(create.contains("\"date\" DATE"), create)
    // no TRUNCATE on this path: the old shape is gone, not refreshed
    assert(!sql.exists(_.startsWith("TRUNCATE")), sql.mkString("\n"))
  }

  test("PG grammar: nullability tightening takes the drop path, not TRUNCATE") {
    val ld = newLoader()
    // names and types match, but the existing table is NOT NULL while the
    // incoming frame is nullable: TRUNCATE would destroy rows then fail
    // the insert on the first null
    FakePg.seed("s.costs", matchingCols(nullable = false))
    ld.load(costsDf, "costs", "replace")
    val sql = FakePg.recorded
    assert(sql.contains("DROP TABLE s.costs CASCADE"), sql.mkString("\n"))
    assert(!sql.exists(_.startsWith("TRUNCATE")), sql.mkString("\n"))
  }

  test("PG grammar: append issues only INSERTs against the existing table") {
    val ld = newLoader()
    FakePg.seed("s.costs", matchingCols())
    ld.load(costsDf, "costs", "append")
    val sql = FakePg.recorded
    assert(sql.exists(_.startsWith("INSERT INTO s.costs")), sql.mkString("\n"))
    assert(!sql.exists(s => s.toUpperCase.startsWith("DROP") ||
      s.toUpperCase.startsWith("CREATE TABLE") || s.toUpperCase.startsWith("TRUNCATE")),
      sql.mkString("\n"))
  }

  test("PG grammar: timestamp column maps to TIMESTAMP in DDL") {
    val ld = newLoader()
    import spark.implicits._
    val df = Seq(("2024-01-05 10:00:00", 1L)).toDF("sync_timestamp", "n")
      .select(col("sync_timestamp").cast("timestamp"), col("n"))
    ld.load(df, "stamps", "replace")
    val create = FakePg.recorded.find(_.startsWith("CREATE TABLE s.stamps"))
      .getOrElse(fail(s"no CREATE TABLE captured:\n${FakePg.recorded.mkString("\n")}"))
    assert(create.contains("\"sync_timestamp\" TIMESTAMP"), create)
    assert(create.contains("\"n\" BIGINT"), create)
  }
}
