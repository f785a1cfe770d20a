package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The partition-retention sweep: both layouts, period-end semantics,
  * idempotence, dry-run, unknown-layout refusal, crash-partial
  * completion. */
class RetentionSpec extends SparkSpec {

  private def ymTable(ld: ParquetLoader): Unit = {
    import spark.implicits._
    // (year, month) rows spanning 2023-11 .. 2024-02
    val df = Seq(
      (2023, 11, "a"), (2023, 12, "b"), (2024, 1, "c"), (2024, 2, "d"))
      .toDF("year", "month", "v")
    ld.load(df, "raw_t", "replace", partitionBy = Seq("year", "month"))
    ()
  }

  test("year/month layout: drops exactly the months whose period ends before the cutoff") {
    val wh = Files.createTempDirectory("graft_ret").toString
    val ld = new ParquetLoader(wh, "s")
    ymTable(ld)
    // cutoff 2024-01-15: 2023-11, 2023-12 end before it; 2024-01 runs
    // through Jan 31 (period-END semantics) and must survive
    val dropped = ld.retention(spark, "raw_t", java.time.LocalDate.parse("2024-01-15"))
    assert(dropped == Seq("year=2023"),
      s"the whole expired year folds into one drop: $dropped")
    val left = ld.table(spark, "raw_t").select("year", "month")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(left == Set((2024, 1), (2024, 2)))
    // idempotent re-run
    assert(ld.retention(spark, "raw_t", java.time.LocalDate.parse("2024-01-15")).isEmpty)
    // a later cutoff takes the January month dir individually
    val d2 = ld.retention(spark, "raw_t", java.time.LocalDate.parse("2024-02-01"))
    assert(d2 == Seq("year=2024/month=1"), d2.toString)
  }

  test("date layout + dry-run + unknown partition keys are skipped, never guessed") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_ret").toString
    val ld = new ParquetLoader(wh, "s")
    val df = Seq(("2024-01-05", 1), ("2024-01-15", 2), ("2024-02-05", 3))
      .toDF("date", "v").withColumn("date", to_date(col("date")))
    ld.load(df, "norm_t", "replace", partitionBy = Seq("date"))
    // dry-run reports, deletes nothing
    val would = ld.retention(spark, "norm_t",
      java.time.LocalDate.parse("2024-01-10"), dryRun = true)
    assert(would == Seq("date=2024-01-05"), would.toString)
    assert(ld.table(spark, "norm_t").count() == 3)
    val did = ld.retention(spark, "norm_t", java.time.LocalDate.parse("2024-01-10"))
    assert(did == would)
    assert(ld.table(spark, "norm_t").select("v").collect().map(_.getInt(0)).toSet == Set(2, 3))
    // a table partitioned by an unswept key is left whole
    val other = Seq(("x", 1), ("y", 2)).toDF("k", "v")
    ld.load(other, "odd_t", "replace", partitionBy = Seq("k"))
    assert(ld.retention(spark, "odd_t", java.time.LocalDate.parse("2030-01-01")).isEmpty)
    assert(ld.table(spark, "odd_t").count() == 2)
  }

  test("a garbage year value is skipped, not a sweep-aborting DateTimeException") {
    val wh = Files.createTempDirectory("graft_ret").toString
    val ld = new ParquetLoader(wh, "s")
    ymTable(ld)
    // an Int-parseable but non-date year dir next to real partitions
    Files.createDirectories(java.nio.file.Paths.get(wh, "s", "raw_t", "year=2000000000"))
    val dropped = ld.retention(spark, "raw_t", java.time.LocalDate.parse("2024-01-01"))
    assert(dropped == Seq("year=2023"), s"real partitions still sweep: $dropped")
    assert(Files.exists(java.nio.file.Paths.get(wh, "s", "raw_t", "year=2000000000")),
      "the unrecognized dir is left alone")
  }

  test("crash-partial sweep: a missing partition dir does not stop the re-run") {
    val wh = Files.createTempDirectory("graft_ret").toString
    val ld = new ParquetLoader(wh, "s")
    ymTable(ld)
    // simulate a crash that deleted 2023/month=11 but not month=12
    val p = java.nio.file.Paths.get(wh, "s", "raw_t", "year=2023", "month=11")
    assert(Files.exists(p))
    def rmAll(d: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    rmAll(p)
    val dropped = ld.retention(spark, "raw_t", java.time.LocalDate.parse("2024-01-01"))
    assert(dropped == Seq("year=2023"), dropped.toString)
    val left = ld.table(spark, "raw_t").select("month").collect().map(_.getInt(0)).toSet
    assert(left == Set(1, 2))
  }
}
