package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards against testdata-regeneration drift (VERDICT r11: the driver
  * regenerated /root/testdata with a different parquet timestamp flavor
  * and three queries died at analysis time).
  *
  *  - the events loader must yield a zoned TimestampType for EVERY
  *    physical flavor the generator has produced: int64 epoch-nanos
  *    (TIMESTAMP(NANOS) under the legacy read conf), TIMESTAMP_MICROS
  *    ntz, TIMESTAMP_MICROS ltz — with identical values;
  *  - every table's logical schema is pinned, so the NEXT regeneration
  *    fails here with a diagnosis instead of an analysis error three
  *    queries deep.
  */
class TablesSpec extends SparkSpec {

  private def writeEvents(flavor: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ts_$flavor").toString
    val us = Seq(1700000000123456L, 1700003600000000L, 1700007199999999L)
    val base = spark.range(3).select(
      col("id").as("event_id"),
      element_at(lit(us.toArray), (col("id") + 1).cast(IntegerType)).as("us"))
    val withTs = flavor match {
      case "nanos_long" => base.withColumn("ts", expr("us * 1000L"))
      case "micros_ntz" => base.withColumn("ts",
        timestamp_micros(col("us")).cast(TimestampNTZType))
      case "micros_ltz" => base.withColumn("ts", timestamp_micros(col("us")))
    }
    withTs.drop("us").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events loader yields zoned TimestampType for all three parquet ts flavors") {
    val expected = Seq(1700000000123456L, 1700003600000000L, 1700007199999999L)
    for (flavor <- Seq("nanos_long", "micros_ntz", "micros_ltz")) {
      val ev = Tables.events(spark, writeEvents(flavor))
      assert(ev.schema("ts").dataType == TimestampType,
        s"flavor $flavor: expected zoned TimestampType, got ${ev.schema("ts").dataType}")
      val got = ev.select(unix_micros(col("ts"))).orderBy(col("event_id"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == expected, s"flavor $flavor: values drifted: $got")
    }
  }

  test("normalizeEventTs rejects an unsupported ts type with a diagnosis") {
    val df = spark.range(1).select(col("id"), lit("x").as("ts"))
    val e = intercept[RuntimeException](Tables.normalizeEventTs(df))
    assert(e.getMessage.contains("unsupported type"))
    assert(e.getMessage.contains("layout drift"))
  }

  test("normalizeEventTs refuses the NTZ cast under a non-UTC session timezone") {
    val dir = writeEvents("micros_ntz")
    // isolated conf: newSession shares the context but owns its SQLConf,
    // so the zone flip can't race concurrently-running suites
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    val e = intercept[IllegalArgumentException](
      Tables.normalizeEventTs(Tables.rd(s2, dir, "events")))
    assert(e.getMessage.contains("America/New_York"), e.getMessage)
    assert(e.getMessage.contains("UTC"), e.getMessage)
    // the same frame normalizes fine in the UTC session
    assert(Tables.normalizeEventTs(Tables.rd(spark, dir, "events"))
      .schema("ts").dataType == TimestampType)
  }

  test("events loader propagates unrelated failures unmodified (narrow nanos catch)") {
    // a MISSING file is not a TIMESTAMP(NANOS) problem: the legacy-conf
    // advice must not wrap it (pre-fix, any Throwable was rewrapped when
    // the conf was unset — reproduce that session state in isolation)
    val empty = java.nio.file.Files.createTempDirectory("graft_ts_none").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    val e = intercept[Throwable](Tables.events(s2, empty))
    assert(!chain(e).exists(_.contains("nanosAsLong")),
      s"missing-file error misattributed to the nanos conf: ${chain(e)}")
  }

  // Logical schema pin for the driver-generated tables. Timestamp-ish
  // columns accept any flavor the loaders normalize (the generator has
  // switched flavors once already); everything else is exact.
  private val tsFlavors: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  private val pinned: Map[String, Seq[(String, Either[DataType, String])]] = {
    def t(dt: DataType) = Left(dt)
    val ts = Right("timestamp-flavor")
    Map(
      "region" -> Seq("r_regionkey" -> t(IntegerType), "r_name" -> t(StringType)),
      "nation" -> Seq("n_nationkey" -> t(IntegerType), "n_name" -> t(StringType),
        "n_regionkey" -> t(IntegerType)),
      "customer" -> Seq("c_custkey" -> t(LongType), "c_name" -> t(StringType),
        "c_nationkey" -> t(IntegerType), "c_acctbal" -> t(DoubleType),
        "c_mktsegment" -> t(StringType)),
      "supplier" -> Seq("s_suppkey" -> t(LongType), "s_name" -> t(StringType),
        "s_nationkey" -> t(IntegerType), "s_acctbal" -> t(DoubleType)),
      "part" -> Seq("p_partkey" -> t(LongType), "p_name" -> t(StringType),
        "p_brand" -> t(StringType), "p_type" -> t(StringType),
        "p_size" -> t(IntegerType), "p_retailprice" -> t(DoubleType)),
      "orders" -> Seq("o_orderkey" -> t(LongType), "o_custkey" -> t(LongType),
        "o_orderstatus" -> t(StringType), "o_totalprice" -> t(DoubleType),
        "o_orderdate" -> ts, "o_orderpriority" -> t(StringType)),
      "lineitem" -> Seq("l_orderkey" -> t(LongType), "l_partkey" -> t(LongType),
        "l_suppkey" -> t(LongType), "l_linenumber" -> t(IntegerType),
        "l_quantity" -> t(DoubleType), "l_extendedprice" -> t(DoubleType),
        "l_discount" -> t(DoubleType), "l_tax" -> t(DoubleType),
        "l_returnflag" -> t(StringType), "l_linestatus" -> t(StringType),
        "l_shipdate" -> ts),
      "events" -> Seq("event_id" -> t(LongType), "ts" -> ts,
        "user_id" -> t(LongType), "event_type" -> t(StringType),
        "value" -> t(DoubleType), "props" -> t(StringType)),
      "documents" -> Seq("doc_id" -> t(LongType), "text" -> t(StringType),
        "lang" -> t(StringType), "source" -> t(StringType),
        "n_chars" -> t(LongType)),
      "embeddings" -> Seq("vec_id" -> t(LongType),
        "embedding" -> t(ArrayType(FloatType)), "label" -> t(IntegerType)))
  }

  test("all 10 testdata tables match the pinned logical schema") {
    val drift = pinned.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      val actual = Tables.rd(spark, sf001, name).schema
      val nameDrift =
        if (actual.fieldNames.toSeq != cols.map(_._1))
          Seq(s"$name: columns ${actual.fieldNames.mkString(",")} != pinned ${cols.map(_._1).mkString(",")}")
        else Seq.empty
      val typeDrift = cols.flatMap {
        case (c, _) if !actual.fieldNames.contains(c) => Seq.empty
        case (c, Left(dt)) if actual(c).dataType != dt =>
          Seq(s"$name.$c: ${actual(c).dataType} != pinned $dt")
        case (c, Right(_)) if !tsFlavors.contains(actual(c).dataType) =>
          Seq(s"$name.$c: ${actual(c).dataType} not a known timestamp flavor " +
            s"(${tsFlavors.mkString("/")}) — extend Tables.normalizeEventTs")
        case _ => Seq.empty
      }
      nameDrift ++ typeDrift
    }
    assert(drift.isEmpty,
      "testdata regeneration drifted from the pinned schema:\n" + drift.mkString("\n"))
  }
}
