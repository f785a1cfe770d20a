package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** O17-O20: writer semantics (reference postgresql.py:38-160) on both
  * sinks — ParquetLoader, and JdbcLoader against in-memory Derby (the
  * embedded DB shipped with Spark's jars). */
class LoaderSpec extends SparkSpec {

  private def df2 = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "Resource.Tags/env")
  }

  test("ParquetLoader: replace overwrites, append accumulates, columns cleaned") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val ld = new ParquetLoader(wh, "s")
    ld.ensureNamespace()
    assert(ld.load(df2, "t", "replace") == 2L)
    assert(ld.load(df2, "t", "append") == 2L) // returns rows loaded
    assert(ld.table(spark, "t").count() == 4L) // append accumulated
    assert(ld.load(df2, "t", "replace") == 2L)
    val back = ld.table(spark, "t")
    assert(back.count() == 2L) // replace dropped previous contents
    assert(back.columns.toSet == Set("id", "resource_tags_env"))
  }

  test("ParquetLoader: empty input short-circuits without touching target") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val ld = new ParquetLoader(wh, "s")
    ld.ensureNamespace()
    ld.load(df2, "t", "replace")
    assert(ld.load(df2.limit(0), "t", "replace") == 0L)
    assert(ld.table(spark, "t").count() == 2L) // unchanged
  }

  test("ParquetLoader: fail mode errors when the table exists") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val ld = new ParquetLoader(wh, "s")
    ld.load(df2, "t", "replace")
    intercept[Exception] { ld.load(df2, "t", "fail") }
  }

  test("ParquetLoader: SQL script runner executes statements in order") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val ld = new ParquetLoader(wh, "s")
    val script = Files.createTempFile("graft", ".sql")
    Files.writeString(script,
      """CREATE OR REPLACE TEMP VIEW loader_script_v AS SELECT 1 AS one;
        |CREATE OR REPLACE TEMP VIEW loader_script_w AS SELECT one + 1 AS two FROM loader_script_v;
        |""".stripMargin)
    ld.runSqlScript(spark, script.toString)
    assert(spark.table("loader_script_w").collect().head.getInt(0) == 2)
  }

  test("JdbcLoader (Derby): namespace, replace/append, read-back, script") {
    val url = s"jdbc:derby:memory:graftdb${System.nanoTime()};create=true"
    val ld = new JdbcLoader(url, "", "", "APP")
    ld.ensureNamespace() // APP exists in Derby; must tolerate
    assert(ld.load(df2, "jt", "replace") == 2L)
    assert(ld.load(df2, "jt", "append") == 2L)
    assert(ld.table(spark, "jt").count() == 4L)
    assert(ld.load(df2, "jt", "replace") == 2L)
    val back = ld.table(spark, "jt")
    assert(back.count() == 2L)
    assert(back.columns.map(_.toLowerCase).toSet == Set("id", "resource_tags_env"))
    val script = Files.createTempFile("graft", ".sql")
    Files.writeString(script,
      "CREATE TABLE APP.script_t (x INT); INSERT INTO APP.script_t VALUES (7)")
    ld.runSqlScript(spark, script.toString)
    assert(ld.table(spark, "script_t").count() == 1L)
  }
}
