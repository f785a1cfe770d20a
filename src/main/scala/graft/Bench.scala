package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    // environment fingerprint for cross-run comparability (heap pressure /
    // CPU contention are the usual causes of bench divergence)
    System.err.println(s"[bench] maxHeap=${Runtime.getRuntime.maxMemory() / (1 << 20)}MiB " +
      s"procs=${Runtime.getRuntime.availableProcessors()} cpus=$cpus")
    // one warmup action so JVM/codegen startup isn't billed to the first query
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // optional prefix filter for local iteration, e.g. SPARK_GRAFT_ONLY=e02,e05
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    // median-of-N per query (VERDICT r3 item 6): single-shot timings on a
    // shared host carry ~1.5-2x load noise, which wastes the perf budget;
    // the median of 3 is robust to one slow rep. Reps run per-query
    // back-to-back; a failure on any rep marks the query failed.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map { v =>
      v.toIntOption.getOrElse {
        System.err.println(s"[bench] SPARK_GRAFT_REPS='$v' is not an int; using 3")
        3
      }
    }.getOrElse(3).max(1)
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // queries that persist internally (e15's connected components) would
        // otherwise serve reps 2..N from rep 1's cache — Spark's cache lookup
        // is by sameResult, so an identical re-built plan hits the entry and
        // the median measures the warm path (VERDICT r5 item 1). Clearing
        // between reps (outside the timed region) keeps every rep cold and
        // leaves the suite's cacheManager empty at exit.
        spark.catalog.clearCache()
        (elapsed, ok)
      }
      val ok = times.forall(_._2)
      val sorted = times.map(_._1).sorted
      val median = sorted(sorted.size / 2)
      (name, if (ok) median else -median, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    val (fixtureSec, syncSec) = syncMirror(spark, sfDir)
    println(s"""{"metric":"conformance_total_s","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"n_ok":${results.count(_._3)},"n_queries":${results.size},"sync_e2e_s":${f"$syncSec%.3f"},"sync_fixture_s":${f"$fixtureSec%.3f"},"sf":"$sfDir"}""")
    spark.stop()
  }

  /** End-to-end sync mirror (scan → filter → normalize → write → costs
    * view), timed on a partitioned CUR-shaped copy of the events table
    * (the BASELINE.md `sync_e2e_s` metric). The fixture build is NOT part
    * of the sync — a real sync reads source files that already exist —
    * so it is timed separately (`sync_fixture_s`) and excluded from
    * `sync_e2e_s`. Returns (fixtureSec, syncSec); syncSec negative on
    * failure. */
  private def syncMirror(spark: SparkSession, sfDir: String): (Double, Double) = {
    val tf = System.nanoTime()
    val root = java.nio.file.Files.createTempDirectory("graft_bench_cur").toString
    val wh = java.nio.file.Files.createTempDirectory("graft_bench_wh").toString
    // set once the fixture write completes, so a SYNC-phase failure still
    // reports the honestly-measured fixture time (not fixture+sync)
    var fixtureDone = -1.0
    try {
      val ids = etl.Accounts.registry.map(_.id)
      Tables.events(spark, sfDir).select(
        col("ts").as("line_item_usage_start_date"),
        element_at(typedlit(ids), (pmod(col("user_id"), lit(ids.size)) + 1).cast("int"))
          .as("line_item_usage_account_id"),
        col("event_type").as("product_servicename"),
        when(pmod(col("user_id"), lit(3)) === 0, "us-east-1")
          .when(pmod(col("user_id"), lit(3)) === 1, "eu-west-2")
          .otherwise("ap-southeast-2").as("product_region"),
        col("value").as("line_item_unblended_cost"),
        lit("USD").as("line_item_currency_code"),
        year(col("ts")).as("year"), month(col("ts")).as("month"))
        // cluster by the partition keys: one file per month, not one per
        // (shuffle partition × month) — same discipline as the loader
        .repartition(col("year"), col("month"))
        .write.partitionBy("year", "month").parquet(s"$root/cur-a")
      val fixtureSec = (System.nanoTime() - tf) / 1e9
      fixtureDone = fixtureSec
      val cfg = etl.EngineConfig(
        sourceRoot = s"file://$root", curPaths = Seq("cur-a"), warehouseDir = wh,
        jdbcUrl = None, jdbcUser = "", jdbcPassword = "", schema = "bench",
        syncMonths = 1, logLevel = "WARN")
      val t0 = System.nanoTime()
      val res = etl.Sync.run(spark, cfg, new etl.ParquetLoader(wh, "bench"),
        etl.Sync.Options(months = 1, asOf = java.time.LocalDate.parse("2024-01-15")))
      require(res.tables.forall(_.status == "success"), "sync mirror failed")
      (fixtureSec, (System.nanoTime() - t0) / 1e9)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] sync mirror FAILED: ${e.getMessage}")
        val fallback =
          if (fixtureDone >= 0) fixtureDone else -(System.nanoTime() - tf) / 1e9
        (fallback, -1.0)
    }
  }
}
