package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout (e80): bit-level interleave parity against a direct
  * Scala Morton reference, the grid-locality property that makes the
  * layout worth a shuffle, and the write path's per-file extents. */
class LayoutSpec extends SparkSpec {

  /** Reference Morton spread, straight from the definition (bit loop),
    * independent of the mask-shift implementation under test. */
  private def refSpread(v: Long): Long =
    (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).sum

  private def refZ(x: Long, y: Long, bx: Layout.Bounds, by: Layout.Bounds): Long = {
    def norm(v: Long, b: Layout.Bounds): Long = {
      val clamped = math.min(b.max, math.max(b.min, v))
      (clamped - b.min) * 65536L / b.span
    }
    refSpread(norm(x, bx)) | (refSpread(norm(y, by)) << 1)
  }

  test("zvalue matches the bit-loop Morton reference on every sf0.001 key pair") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"))
    val (bx, by) = Layout.bounds2(li, "l_partkey", "l_suppkey")
    val got = li.withColumn("z", Layout.zvalue(col("l_partkey"), col("l_suppkey"), bx, by))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == refZ(x, y, bx, by), s"z mismatch for ($x, $y)")
    }
  }

  test("64-bucket z-grid bounds every bucket's extent on BOTH dimensions") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"))
    val bx = Layout.bounds(li, "l_partkey")
    val by = Layout.bounds(li, "l_suppkey")
    val stats = li
      .withColumn("z", Layout.zvalue(col("l_partkey"), col("l_suppkey"), bx, by))
      .groupBy(shiftright(col("z"), 26).as("bucket"))
      .agg(min("l_partkey").as("minp"), max("l_partkey").as("maxp"),
        min("l_suppkey").as("mins"), max("l_suppkey").as("maxs"))
      .collect()
    assert(stats.length > 1)
    // top-3 bits per dimension → every bucket spans ≤ 1/8th of each
    // dimension's full range (+1 cell of fixed-point slack)
    val pCell = bx.span / 8 + 2
    val sCell = by.span / 8 + 2
    stats.foreach { r =>
      assert(r.getLong(2) - r.getLong(1) <= pCell,
        s"bucket ${r.get(0)} partkey span ${r.getLong(2) - r.getLong(1)} > $pCell")
      assert(r.getLong(4) - r.getLong(3) <= sCell,
        s"bucket ${r.get(0)} suppkey span ${r.getLong(4) - r.getLong(3)} > $sCell")
    }
  }

  test("zorderWrite produces files with tight min/max extents on both columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"))
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", dir, nFiles = 16)

    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.columns.toSet == Set("l_partkey", "l_suppkey"), "helper column leaked")

    val bx = Layout.bounds(li, "l_partkey")
    val by = Layout.bounds(li, "l_suppkey")
    val perFile = back
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("l_partkey") - min("l_partkey")).as("pspan"),
        (max("l_suppkey") - min("l_suppkey")).as("sspan"))
      .collect()
    assert(perFile.length > 4, s"expected multiple output files, got ${perFile.length}")
    // A contiguous z-range can straddle one high-bit boundary, so a
    // single file may span wide on one dim; the LAYOUT property is the
    // average: most files cover a small rectangle of the key space.
    val avgP = perFile.map(_.getLong(1)).sum.toDouble / perFile.length
    val avgS = perFile.map(_.getLong(2)).sum.toDouble / perFile.length
    assert(avgP <= bx.span / 2.0, s"avg partkey file span $avgP vs full ${bx.span}")
    assert(avgS <= by.span / 2.0, s"avg suppkey file span $avgS vs full ${by.span}")
  }

  test("bounds refuse spans wider than the exact fixed-point domain") {
    intercept[IllegalArgumentException] {
      Layout.Bounds(0L, 1L << 32)
    }
  }

  test("rows outside stale bounds clamp to edge cells instead of corrupting the interleave") {
    import spark.implicits._
    val df = Seq((5L, 5L), (500L, 500L)).toDF("x", "y")
    val b = Layout.Bounds(0L, 99L) // stale: excludes 500
    val z = df.select(Layout.zvalue(col("x"), col("y"), b, b).as("z"))
      .orderBy("z").as[Long].collect()
    assert(z.last == refZ(99L, 99L, b, b), "out-of-bounds row must land on the max cell")
    assert(z.head == refZ(5L, 5L, b, b))
  }
}
