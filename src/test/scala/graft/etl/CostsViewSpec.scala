package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** O16 union view semantics (reference normalize.py:112-143). */
class CostsViewSpec extends SparkSpec {

  private lazy val ts = to_timestamp(lit("2024-06-01 00:00:00"))

  private def norm(n: Int, tag: String) = {
    import spark.implicits._
    val base = (1 to n).map(i => (s"2024-01-0$i", s"acct$i", i.toDouble))
      .toDF("usage_start_date", "usage_account_id", "unblended_cost")
    Normalize.normalize(base, Normalize.awsCur, tag, ts)
  }

  test("view row count is the sum of the inputs (UNION ALL, not UNION)") {
    val v = CostsView.build(Seq(norm(3, "a"), norm(3, "a"), norm(2, "b")))
    assert(v.count() == 8)
  }

  test("view exposes exactly the 9 declared columns in order") {
    val v = CostsView.build(Seq(norm(1, "a")))
    assert(v.columns.toSeq == Normalize.targetColumns)
  }

  test("schema drift across sources: missing columns NULL-fill by name") {
    import spark.implicits._
    val complete = norm(2, "a")
    val drifted = complete.drop("region").withColumn("extra", lit(1))
    val v = CostsView.build(Seq(complete, drifted))
    assert(v.columns.toSeq == Normalize.targetColumns)
    assert(v.count() == 4)
    assert(v.filter(col("region").isNull).count() >= 2)
  }

  test("catalog flow: create registers the view over *_normalized tables") {
    norm(2, "x").createOrReplaceTempView("x_normalized")
    norm(3, "y").createOrReplaceTempView("y_normalized")
    CostsView.create(spark, Seq("x", "y"))
    assert(spark.table("costs").count() == 5)
  }

  test("durable DDL survives an adversarial warehouse path; bad view names rejected") {
    val base = java.nio.file.Files.createTempDirectory("graft_wh")
    // a backtick in the path must not break out of the quoted table ref
    val wh = new java.io.File(base.toFile, "back`tick wh").toString
    val ld = new ParquetLoader(wh, "s")
    ld.ensureNamespace()
    ld.load(norm(2, "adv"), "adv_normalized", "replace")
    CostsView.createDurable(spark, Seq(ld.sqlRef("adv_normalized").get), "costs_adv")
    assert(spark.table("costs_adv").count() == 2)
    val e = intercept[IllegalArgumentException] {
      CostsView.createDurable(spark, Seq("parquet.`/tmp/x`"), "costs; DROP TABLE t")
    }
    assert(e.getMessage.contains("plain SQL identifier"))
  }
}
