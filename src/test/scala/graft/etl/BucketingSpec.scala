package graft.etl

import graft.{SparkSpec, Tables => T}

/** Bucketed co-located join: the fact⋈fact exchange disappears. */
class BucketingSpec extends SparkSpec {

  test("same-bucketed fact tables join without any Exchange") {
    // warehouse dir is a temp dir set statically in SparkSpec
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Bucketing.writeBucketed(T.orders(spark, sf001), "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(T.lineitem(spark, sf001), "b_lineitem", "l_orderkey", 8)
    // force the shuffle-sensitive plan: no broadcast fallback
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.colocatedJoin(spark, "b_orders", "o_orderkey", "b_lineitem", "l_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it returns the same rows as the plain join
      val o = T.orders(spark, sf001)
      val li = T.lineitem(spark, sf001)
      val plain = o.join(li, o("o_orderkey") === li("l_orderkey"))
      assert(j.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("z-value interleaves bucket bits: hand-computed Morton codes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // domain [0, 4): 2-bit buckets 0..3 at width 1
    val df = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (2.0, 1.0))
      .toDF("x", "y")
    val zv = Bucketing.zValue(Seq(
      (col("x"), lit(0.0), lit(4.0)), (col("y"), lit(0.0), lit(4.0))), bits = 2)
    val got = df.select(col("x"), col("y"), zv).collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), r.getLong(2))).toMap
    // interleave(bx, by): bit j of x at 2j, of y at 2j+1
    def morton(bx: Long, by: Long) =
      (0 until 2).map(j => (((bx >> j) & 1) << (2 * j)) | (((by >> j) & 1) << (2 * j + 1))).sum
    assert(got((0.0, 0.0)) == morton(0, 0))
    assert(got((3.0, 0.0)) == morton(3, 0))
    assert(got((0.0, 3.0)) == morton(0, 3))
    assert(got((3.0, 3.0)) == morton(3, 3))
    assert(got((2.0, 1.0)) == morton(2, 1))
    // degenerate domain collapses to bucket 0, values at max clamp to n-1
    val edge = Seq((5.0, 4.0)).toDF("x", "y")
      .select(Bucketing.zValue(Seq(
        (col("x"), lit(5.0), lit(5.0)), (col("y"), lit(0.0), lit(4.0))), bits = 2))
      .collect().head.getLong(0)
    assert(edge == morton(0, 3), s"edge z-value: $edge")
  }

  test("z-value property — de-interleaving recovers every per-column bucket") {
    import org.scalacheck.Gen
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val seed0 = org.scalacheck.rng.Seed(31L)
    val geom = for {
      k <- Gen.choose(2, 3)
      bits <- Gen.choose(2, 6)
      lo <- Gen.choose(-100.0, 100.0)
      w <- Gen.choose(1.0, 500.0)
      n <- Gen.choose(5, 40)
      rows <- Gen.listOfN(n, Gen.listOfN(k, Gen.choose(lo - 10, lo + w + 10)))
    } yield (k, bits, lo, w, rows)
    Iterator.iterate(seed0)(_.next).take(12).foreach { seed =>
      geom.apply(Gen.Parameters.default, seed).foreach { case (k, bits, lo, w, rows) =>
        val df = rows.zipWithIndex.map { case (vs, i) => (i.toLong, vs) }
          .toDF("id", "vs")
        val cols = (0 until k).map(i =>
          (element_at(col("vs"), i + 1), lit(lo), lit(lo + w)))
        val out = df.select(col("vs"), Bucketing.zValue(cols, bits)).collect()
        val n = 1L << bits
        out.foreach { r =>
          val vs = r.getSeq[Double](0)
          val zv = r.getLong(1)
          vs.zipWithIndex.foreach { case (v, i) =>
            // reference bucket, same pinned arithmetic — the width is
            // (hi − lo) with hi = lo + w exactly as the operator
            // receives it, NOT w: ((lo + w) − lo) can differ from w in
            // the last ulp and flip floor() at a bucket boundary
            val width = (lo + w) - lo
            val b = math.min(math.max(
              math.floor((v - lo) * n.toDouble / width).toLong, 0L), n - 1)
            // de-interleave column i's bits back out of the z-value
            val back = (0 until bits).map(j => ((zv >> (j * k + i)) & 1L) << j).sum
            assert(back == b, s"col $i of $vs (bits=$bits): z=$zv got $back want $b")
          }
        }
      }
    }
  }

  test("z-clustering bounds every file's span on BOTH range dimensions") {
    import org.apache.spark.sql.functions._
    val li = T.lineitem(spark, sf001)
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Bucketing.zCluster(li, Seq("l_extendedprice", "l_quantity"), nPartitions = 16)
      .write.mode("overwrite").parquet(out)
    val dom = li.agg(
      max(col("l_extendedprice")) - min(col("l_extendedprice")),
      max(col("l_quantity")) - min(col("l_quantity"))).head()
    val (domP, domQ) = (dom.getDouble(0), dom.getDouble(1))
    // per-FILE spans: after z-clustering each parquet file must cover a
    // narrow slice of BOTH columns — that is precisely what makes
    // min/max stats prune files and row groups for a predicate on
    // EITHER column. A single-column sort would give ~full-domain
    // spans on the other column; unclustered input gives ~full spans on
    // both. Averages, not maxima: the z-curve necessarily has a few
    // boundary-crossing files.
    val spans = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .groupBy(col("f")).agg(
        (max(col("l_extendedprice")) - min(col("l_extendedprice"))).as("sp"),
        (max(col("l_quantity")) - min(col("l_quantity"))).as("sq"))
      .agg(avg(col("sp")), avg(col("sq")), count(lit(1))).head()
    val (avgP, avgQ, nFiles) = (spans.getDouble(0), spans.getDouble(1), spans.getLong(2))
    assert(nFiles >= 8, s"expected >=8 files, got $nFiles")
    assert(avgP < 0.5 * domP,
      s"price span $avgP not bounded vs domain $domP")
    assert(avgQ < 0.5 * domQ,
      s"quantity span $avgQ not bounded vs domain $domQ")
    // and the clustered result is the same multiset of rows with the
    // INPUT's schema — the internal z-value never leaks to the sink
    assert(spark.read.parquet(out).count() == li.count())
    assert(spark.read.parquet(out).columns.sorted.toSeq == li.columns.sorted.toSeq,
      "z-clustering must not change the schema")
  }

  test("64-bucket z-grid bounds every bucket's extent on BOTH dimensions (the e80 frame)") {
    import org.apache.spark.sql.functions._
    val li = T.lineitem(spark, sf001).select(col("l_partkey"), col("l_suppkey"))
    val row = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val (pmn, pmx, smn, smx) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val zv = Bucketing.zValue(Seq(
      (col("l_partkey"), lit(pmn), lit(pmx)),
      (col("l_suppkey"), lit(smn), lit(smx))), bits = 8)
    val stats = li.withColumn("zv", zv)
      .groupBy(shiftright(col("zv"), 10).as("bucket"))
      .agg(min(col("l_partkey")).as("minp"), max(col("l_partkey")).as("maxp"),
        min(col("l_suppkey")).as("mins"), max(col("l_suppkey")).as("maxs"))
      .collect()
    assert(stats.length > 1)
    // bucket = the top 3 interleaved bits of each dimension → every
    // bucket spans ≤ 1/8th of each dimension's domain (+ floor slack)
    val pCell = (pmx - pmn) / 8 + 2
    val sCell = (smx - smn) / 8 + 2
    stats.foreach { r =>
      assert(r.getLong(2) - r.getLong(1) <= pCell,
        s"bucket ${r.get(0)} partkey span ${r.getLong(2) - r.getLong(1)} > $pCell")
      assert(r.getLong(4) - r.getLong(3) <= sCell,
        s"bucket ${r.get(0)} suppkey span ${r.getLong(4) - r.getLong(3)} > $sCell")
    }
  }
}
