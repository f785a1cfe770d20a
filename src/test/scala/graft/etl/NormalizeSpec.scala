package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** O10 fallback resolution, O12 metadata literals, O13/O14 lenient
  * casts, O15 empty short-circuit (reference normalize.py:44-109). */
class NormalizeSpec extends SparkSpec {
  import Normalize._

  private lazy val ts = to_timestamp(lit("2024-06-01 00:00:00"))

  test("O10: primary source column wins when present") {
    import spark.implicits._
    val df = Seq(("2024-01-01", "primary", "alt")).toDF(
      "line_item_usage_start_date", "product_servicename", "product_productname")
    val out = normalize(df, awsCur, "t", ts).collect().head
    assert(out.getAs[String]("service") == "primary")
  }

  test("O10: first present alternative wins in declared list order") {
    import spark.implicits._
    // service alternatives: product_productname, lineitem_productcode, ...
    val df = Seq(("code", "prodname")).toDF("lineitem_productcode", "product_productname")
    val out = normalize(df, awsCur, "t", ts).collect().head
    assert(out.getAs[String]("service") == "prodname") // earlier in list
  }

  test("O10: unresolvable target becomes NULL of the declared type") {
    import spark.implicits._
    val df = Seq(Tuple1("x")).toDF("unrelated")
    val row = normalize(df, awsCur, "t", ts).collect().head
    assert(row.getAs[Any]("region") == null && row.getAs[Any]("cost") == null)
    val schema = normalize(df, awsCur, "t", ts).schema
    assert(schema("date").dataType == DateType)
    assert(schema("cost").dataType == DoubleType)
  }

  test("O12: metadata literals appended") {
    import spark.implicits._
    val df = Seq(Tuple1("x")).toDF("unrelated")
    val row = normalize(df, awsCur, "src_table", ts, provider = "aws").collect().head
    assert(row.getAs[String]("cloud_provider") == "aws")
    assert(row.getAs[String]("source_table") == "src_table")
    assert(row.getAs[java.sql.Timestamp]("sync_timestamp") ==
      java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T00:00:00Z")))
  }

  test("O13/O14: malformed date and cost coerce to NULL, never throw") {
    import spark.implicits._
    val df = Seq(("not-a-date", "not-a-number"), ("2024-02-03", "1.5"))
      .toDF("line_item_usage_start_date", "line_item_unblended_cost")
    val rows = normalize(df, awsCur, "t", ts).orderBy(col("date").asc_nulls_first).collect()
    assert(rows(0).getAs[Any]("date") == null && rows(0).getAs[Any]("cost") == null)
    assert(rows(1).getAs[java.sql.Date]("date").toString == "2024-02-03")
    assert(rows(1).getAs[Double]("cost") == 1.5)
  }

  test("O10: raw CUR v1 headers (mixed case, slashes) resolve via transform-side cleaning") {
    import spark.implicits._
    // reference normalize.py:66 cleans the frame's columns BEFORE
    // resolution: `lineItem/UsageStartDate` → `lineitem_usagestartdate`,
    // which is a declared alternative — must resolve, not NULL-fill.
    val df = Seq(("2024-03-04T00:00:00Z", "42.5", "AmazonEC2"))
      .toDF("lineItem/UsageStartDate", "lineItem/UnblendedCost", "product:ProductName")
    val row = normalize(df, awsCur, "t", ts).collect().head
    assert(row.getAs[java.sql.Date]("date").toString == "2024-03-04")
    assert(row.getAs[Double]("cost") == 42.5)
    assert(row.getAs[String]("service") == "AmazonEC2")
  }

  test("O15: schema totality — any input schema yields exactly the 9 declared columns") {
    import spark.implicits._
    val inputs = Seq(
      Seq(Tuple1("a")).toDF("random_col"),
      Seq(("a", "b")).toDF("usage_start_date", "unblended_cost"),
      emptyNormalized(spark))
    inputs.foreach { df =>
      assert(normalize(df, awsCur, "t", ts).columns.toSeq == targetColumns)
    }
    assert(emptyNormalized(spark).columns.toSeq == targetColumns)
    assert(emptyNormalized(spark).count() == 0)
  }
}
