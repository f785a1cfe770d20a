package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json).
  *
  * Timing rules (VERDICT r1 item 7):
  *  - results go to the `noop` sink, so sorts/projections are executed,
  *    not optimized away as they would be under `.count()`;
  *  - failures are reported as failures (negative time + "failed" list),
  *    never silently folded into the total;
  *  - session matches Verify (UTC, nanos legacy read) so bench and
  *    correctness see identical date semantics.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one warmup action so JVM/codegen startup isn't billed to the first query
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -sec, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    println(s"""{"metric":"conformance_total_s","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"n_ok":${results.count(_._3)},"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
