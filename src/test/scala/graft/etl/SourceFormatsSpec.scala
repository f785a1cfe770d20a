package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY §2.4 capability rows that "come free" and the approx-distinct
  * sketch — proven, not assumed. */
class SourceFormatsSpec extends SparkSpec {

  private def sample = {
    import spark.implicits._
    Seq(("2024-01-01 10:00:00", "111111111111", 1.5, "S3"),
        ("2024-01-02 11:00:00", "222222222222", 2.5, "EC2"))
      .toDF("usage_start_date", "usage_account_id", "unblended_cost", "product_name")
  }

  test("CSV source feeds the same normalize pipeline") {
    val dir = Files.createTempDirectory("graft_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    val norm = Normalize.normalize(back, Normalize.awsCur, "csv_src",
      to_timestamp(lit("2024-06-01 00:00:00")))
    assert(norm.columns.toSeq == Normalize.targetColumns)
    assert(norm.filter(col("cost").isNotNull).count() == 2)
    assert(norm.select("service").collect().map(_.getString(0)).toSet == Set("S3", "EC2"))
  }

  test("JSON source feeds the same normalize pipeline") {
    val dir = Files.createTempDirectory("graft_json").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    val norm = Normalize.normalize(back, Normalize.awsCur, "json_src",
      to_timestamp(lit("2024-06-01 00:00:00")))
    assert(norm.count() == 2)
    assert(norm.filter(col("account_id") === "111111111111").count() == 1)
  }

  test("ORC round-trips lineitem bit-exact and feeds the normalize pipeline") {
    // ORC is the other columnar format Spark ships natively (no external
    // module); prove the source/sink path end-to-end: a parquet-read
    // frame written to ORC and read back is row-identical, and the
    // CUR-ish sample flows through normalize the same as CSV/JSON.
    val li = graft.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate", "l_returnflag")
    val dir = Files.createTempDirectory("graft_orc").toString
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == li.schema, "ORC must preserve the read schema")
    val diff = back.unionAll(li).groupBy(back.columns.map(col).toSeq: _*)
      .count().filter(col("count") % 2 =!= 0).count()
    assert(diff == 0, s"$diff rows differ across the ORC round-trip")

    val curDir = Files.createTempDirectory("graft_orc_cur").toString
    sample.write.mode("overwrite").orc(curDir)
    val norm = Normalize.normalize(spark.read.orc(curDir), Normalize.awsCur,
      "orc_src", to_timestamp(lit("2024-06-01 00:00:00")))
    assert(norm.count() == 2)
    assert(norm.columns.toSeq == Normalize.targetColumns)
  }

  test("approx_count_distinct (HLL++) lands within 5% of exact on lineitem keys") {
    val li = graft.Tables.lineitem(spark, sf001)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect().head
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }
}
