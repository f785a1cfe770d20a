package graft.plans

import graft.SparkSpec
import graft.etl.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class MvRewriteSpec extends SparkSpec {
  import spark.implicits._
  import MaterializedView._

  private val Dec = DecimalType(38, 6)

  private lazy val baseDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_base").toString
    Seq(
      ("click", "2024-01-01", 1.5), ("click", "2024-01-01", 2.5),
      ("click", "2024-01-02", 4.0), ("view", "2024-01-01", 8.0),
      ("view", "2024-01-02", 16.0), ("view", "2024-01-02", 0.5))
      .toDF("event_type", "day", "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private lazy val mvDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_state").toString
    Incremental.partials(spark.read.parquet(baseDir), Seq("event_type", "day"), "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def mvDefs = Seq(MvDef(
    baseDir, spark.read.parquet(mvDir), Seq("event_type", "day"), "value"))

  private def query(): DataFrame =
    spark.read.parquet(baseDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt_q"),
        sum(col("value").cast(Dec)).as("sum_q"),
        min(col("value")).as("min_q"),
        max(col("value")).as("max_q"))
      .orderBy(col("event_type"))

  test("rewrite fires: the scan reads the MV, not the base table") {
    serveWith(spark, mvDefs) {
      val files = query().queryExecution.executedPlan.toString
      assert(files.contains(new java.io.File(mvDir).getName),
        s"expected a scan of the MV:\n$files")
      assert(!files.contains(new java.io.File(baseDir).getName),
        s"base table must not be scanned:\n$files")
    }
  }

  test("two CONCURRENT serves both execute rewritten plans (re-entrancy, VERDICT r20 #1)") {
    // the unsynchronized prev :+ rule / restore-prev pattern let two
    // overlapping serves drop each other's rule — the silent base-scan
    // fallback through a different door. Each body must see its own
    // rule for its WHOLE extent, however the two interleave.
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def servedPlan(): String = servePinned(spark, mvDefs) {
      barrier.await() // both serves are now inside their rule context
      val q = query()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(mvDir).getName) &&
        !plan.contains(new java.io.File(baseDir).getName),
        s"concurrent serve must read partials only:\n$plan")
      barrier.await() // hold the context until BOTH have planned
      q
    }.queryExecution.executedPlan.toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = servedPlan() })
      val fb = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = servedPlan() })
      fa.get(); fb.get()
      ()
    } finally { pool.shutdown(); () }
    // after both restores the session carries no leftover rewrite rule
    assert(spark.experimental.extraOptimizations
      .forall(!_.isInstanceOf[RewriteToMv]))
  }

  test("a NESTED serve keeps the outer rule active after the inner restores") {
    serveWith(spark, mvDefs) {
      serveWith(spark, mvDefs) {
        assert(spark.experimental.extraOptimizations
          .count(_.isInstanceOf[RewriteToMv]) == 2)
      }
      val plan = query().queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(mvDir).getName) &&
        !plan.contains(new java.io.File(baseDir).getName),
        s"outer serve must still rewrite after the inner restore:\n$plan")
    }
    assert(spark.experimental.extraOptimizations
      .forall(!_.isInstanceOf[RewriteToMv]))
  }

  test("a frame ESCAPING serveWith re-optimizes without the rule; servePinned keeps the serve real") {
    // extraOptimizations is read per EXECUTION: a lazy frame returned
    // out of the block re-derives from the BASE table at its next
    // action (rows identical by the maintained identity — no hash can
    // catch it; the r20 e122 sf100 phase probe measured the escaped
    // re-join at 64.7 s vs a sub-second rewritten serve)
    val escaped = serveWith(spark, mvDefs) { query() }
    val escapedPlan = escaped.queryExecution.executedPlan.toString
    assert(escapedPlan.contains(new java.io.File(baseDir).getName),
      s"expected the escaped frame to fall back to the base scan:\n$escapedPlan")
    // servePinned materializes the REWRITTEN plan in-block: the caller
    // holds checkpoint-backed rows that never touch the base again
    val pinned = servePinned(spark, mvDefs) { query() }
    val pinnedPlan = pinned.queryExecution.executedPlan.toString
    assert(!pinnedPlan.contains(new java.io.File(baseDir).getName) &&
      !pinnedPlan.contains(new java.io.File(mvDir).getName),
      s"pinned frame must read its materialized rows, not re-plan a scan:\n$pinnedPlan")
    assert(pinned.collect().toSeq === query().collect().toSeq)
    graft.ext.Checkpoints.releaseLineage(pinned)
  }

  test("partial-key rollup from the MV equals the full recompute, bit for bit") {
    val direct = query().collect().toSeq
    val served = serveWith(spark, mvDefs) { query().collect().toSeq }
    assert(served === direct)
  }

  test("full-key grouping also rewrites and matches") {
    val q = () => spark.read.parquet(baseDir)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("value").cast(Dec)).as("s"), count(lit(1)).as("c"))
      .orderBy(col("event_type"), col("day"))
    val direct = q().collect().toSeq
    serveWith(spark, mvDefs) {
      assert(q().queryExecution.executedPlan.toString
        .contains(new java.io.File(mvDir).getName))
      assert(q().collect().toSeq === direct)
    }
  }

  test("key-filtered aggregate (the D1 dashboard shape) rewrites and matches") {
    val q = () => spark.read.parquet(baseDir)
      .filter(col("day") >= "2024-01-02")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"), sum(col("value").cast(Dec)).as("s"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      .orderBy(col("event_type"))
    val direct = q().collect().toSeq
    serveWith(spark, mvDefs) {
      val plan = q().queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(mvDir).getName),
        s"expected the key-filtered aggregate to serve from the MV:\n$plan")
      assert(!plan.contains(new java.io.File(baseDir).getName))
      assert(q().collect().toSeq === direct)
    }
  }

  test("compound key filter (two keys) rewrites and matches") {
    val q = () => spark.read.parquet(baseDir)
      .filter(col("day") >= "2024-01-01" && col("event_type") =!= "view")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("c"), sum(col("value").cast(Dec)).as("s"))
      .orderBy(col("day"))
    val direct = q().collect().toSeq
    serveWith(spark, mvDefs) {
      assert(q().queryExecution.executedPlan.toString
        .contains(new java.io.File(mvDir).getName))
      assert(q().collect().toSeq === direct)
    }
  }

  test("global count over a filtered-to-empty base rewrites and still returns 0") {
    val q = () => spark.read.parquet(baseDir)
      .filter(col("day") > "2099-01-01")
      .agg(count(lit(1)).as("c"))
    val direct = q().collect().toSeq
    assert(direct.head.getLong(0) === 0L)
    serveWith(spark, mvDefs) {
      assert(q().queryExecution.executedPlan.toString
        .contains(new java.io.File(mvDir).getName))
      assert(q().collect().toSeq === direct)
    }
  }

  test("a suffix-colliding relative basePath does NOT hijack the scan") {
    // old behavior: `p.endsWith(basePath)` let a registered relative
    // path like 'graft_mv_base…' match ANY scan whose absolute path
    // happened to end with it; exact-URI qualification forbids that
    val suffix = new java.io.File(baseDir).getName
    val defs = Seq(MvDef(suffix, spark.read.parquet(mvDir), Seq("event_type", "day"), "value"))
    serveWith(spark, defs) {
      assert(query().queryExecution.executedPlan.toString
        .contains(suffix + "]")
        || query().queryExecution.executedPlan.toString
        .contains(new java.io.File(baseDir).getName),
        "base table must still be scanned")
      assert(!query().queryExecution.executedPlan.toString
        .contains(new java.io.File(mvDir).getName),
        "the MV must NOT serve a suffix-colliding path")
    }
  }

  test("no rewrite for: non-key-filtered child, non-key grouping, non-mergeable aggregate") {
    serveWith(spark, mvDefs) {
      val filtered = spark.read.parquet(baseDir)
        .filter(col("value") > 1.0).groupBy(col("event_type"))
        .agg(sum(col("value").cast(Dec)).as("s"))
      assert(filtered.queryExecution.executedPlan.toString
        .contains(new java.io.File(baseDir).getName))
      val nonKey = spark.read.parquet(baseDir)
        .groupBy(col("value")).agg(count(lit(1)).as("c"))
      assert(nonKey.queryExecution.executedPlan.toString
        .contains(new java.io.File(baseDir).getName))
      val avgQ = spark.read.parquet(baseDir)
        .groupBy(col("event_type")).agg(avg(col("value")).as("a"))
      assert(avgQ.queryExecution.executedPlan.toString
        .contains(new java.io.File(baseDir).getName))
      // bare double sum is order-dependent — must NOT be served from partials
      val rawSum = spark.read.parquet(baseDir)
        .groupBy(col("event_type")).agg(sum(col("value")).as("s"))
      assert(rawSum.queryExecution.executedPlan.toString
        .contains(new java.io.File(baseDir).getName))
    }
  }

  test("read-side cast folded into the aggregate still rewrites (CollapseProject)") {
    val q = () => spark.read.parquet(baseDir)
      .groupBy(col("event_type"))
      .agg(sum(col("value").cast(Dec)).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
    val direct = q().collect().toSeq
    serveWith(spark, mvDefs) {
      assert(q().queryExecution.executedPlan.toString
        .contains(new java.io.File(mvDir).getName))
      assert(q().collect().toSeq === direct)
    }
  }

  test("one view serves MULTIPLE occurrences in the same query (fresh exprIds)") {
    val q = () => {
      val byType = spark.read.parquet(baseDir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("c"))
        .select(col("event_type").as("g"), col("c"))
      val byDay = spark.read.parquet(baseDir)
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
        .select(col("day").as("g"), col("c"))
      byType.unionByName(byDay).orderBy(col("g"))
    }
    val direct = q().collect().toSeq
    serveWith(spark, mvDefs) {
      val plan = q().queryExecution.executedPlan.toString
      assert(!plan.contains(new java.io.File(baseDir).getName),
        s"both aggregate occurrences must serve from the MV:\n$plan")
      assert(q().collect().toSeq === direct)
    }
  }

  test("a DERIVED (non-relation) mv plan serves multiple occurrences too") {
    // the mv is an in-memory Aggregate plan, not a parquet read — no
    // MultiInstanceRelation at its root, so the rewrite's fresh-output
    // fallback (alias-only Project) is what prevents duplicate
    // attributes when one view serves two aggregate occurrences
    val mem = Seq(
      ("click", "2024-01-01", 1.5), ("click", "2024-01-01", 2.5),
      ("click", "2024-01-02", 4.0), ("view", "2024-01-01", 8.0),
      ("view", "2024-01-02", 16.0), ("view", "2024-01-02", 0.5))
      .toDF("event_type", "day", "value")
    val derived = Seq(MvDef(baseDir,
      Incremental.partials(mem, Seq("event_type", "day"), "value"),
      Seq("event_type", "day"), "value"))
    val q = () => {
      val byType = spark.read.parquet(baseDir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("c"))
        .select(col("event_type").as("g"), col("c"))
      val byDay = spark.read.parquet(baseDir)
        .groupBy(col("day")).agg(count(lit(1)).as("c"))
        .select(col("day").as("g"), col("c"))
      byType.unionByName(byDay).orderBy(col("g"))
    }
    val direct = q().collect().toSeq
    serveWith(spark, derived) {
      val plan = q().queryExecution.executedPlan.toString
      assert(!plan.contains(new java.io.File(baseDir).getName),
        s"both occurrences must serve from the derived MV plan:\n$plan")
      assert(q().collect().toSeq === direct)
    }
  }

  test("the COARSEST matching view wins when several match") {
    // a second, coarser MV keyed on event_type only
    val coarseDir = java.nio.file.Files.createTempDirectory("graft_mv_coarse").toString
    Incremental.partials(spark.read.parquet(baseDir), Seq("event_type"), "value")
      .write.mode("overwrite").parquet(coarseDir)
    val both = mvDefs :+ MvDef(
      baseDir, spark.read.parquet(coarseDir), Seq("event_type"), "value")
    val q = () => spark.read.parquet(baseDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"), sum(col("value").cast(Dec)).as("s"))
      .orderBy(col("event_type"))
    val direct = q().collect().toSeq
    serveWith(spark, both) {
      val plan = q().queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(coarseDir).getName),
        s"expected the single-key (coarsest) partials to serve:\n$plan")
      assert(q().collect().toSeq === direct)
    }
    // a query needing the finer grouping still routes to the finer MV
    val fine = () => spark.read.parquet(baseDir)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c")).orderBy(col("event_type"), col("day"))
    val fineDirect = fine().collect().toSeq
    serveWith(spark, both) {
      assert(fine().queryExecution.executedPlan.toString
        .contains(new java.io.File(mvDir).getName))
      assert(fine().collect().toSeq === fineDirect)
    }
  }

  test("retractable (cnt/sum-only) MV serves count/sum; min/max stay on the base") {
    val rDir = java.nio.file.Files.createTempDirectory("graft_mv_retract").toString
    Incremental.retractablePartials(
        spark.read.parquet(baseDir), Seq("event_type", "day"), "value")
      .write.mode("overwrite").parquet(rDir)
    val defs = Seq(MvDef(
      baseDir, spark.read.parquet(rDir), Seq("event_type", "day"), "value"))
    val q = () => spark.read.parquet(baseDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"), sum(col("value").cast(Dec)).as("s"))
      .orderBy(col("event_type"))
    val direct = q().collect().toSeq
    serveWith(spark, defs) {
      assert(q().queryExecution.executedPlan.toString
        .contains(new java.io.File(rDir).getName),
        "count/sum must serve from the retractable MV")
      assert(q().collect().toSeq === direct)
      // a min aggregate has no min_v to read — must stay on the base
      val minQ = spark.read.parquet(baseDir)
        .groupBy(col("event_type")).agg(min(col("value")).as("m"))
      assert(minQ.queryExecution.executedPlan.toString
        .contains(new java.io.File(baseDir).getName),
        "min must NOT rewrite against a cnt/sum-only MV")
    }
  }

  test("registration is scoped: after serveWith, queries read the base again") {
    serveWith(spark, mvDefs) { query().collect() }
    assert(query().queryExecution.executedPlan.toString
      .contains(new java.io.File(baseDir).getName))
  }

  // ---------------- join-view serving (JoinMvDef) ----------------

  // star fixture: fact(k, pay, value) ⋈ dim(k, g) — k=4 has no dim row
  // (dropped by the inner join), dim k=9 matches nothing
  private lazy val factDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_fact").toString
    Seq((1L, "p1", 1.5), (1L, "p2", 2.5), (2L, "p3", 4.0),
      (3L, "p4", 8.0), (4L, "p5", 99.0))
      .toDF("k", "pay", "value").write.mode("overwrite").parquet(dir)
    dir
  }
  private lazy val dimDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_dim").toString
    Seq((1L, "red"), (2L, "red"), (3L, "blue"), (9L, "green"))
      .toDF("k", "g").write.mode("overwrite").parquet(dir)
    dir
  }
  private lazy val joinMvDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_jview").toString
    Incremental.partials(
      spark.read.parquet(factDir).join(spark.read.parquet(dimDir), Seq("k")),
      Seq("g"), "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }
  private def joinDefs = Seq(JoinMvDef(
    factDir, dimDir, Seq("k"), spark.read.parquet(joinMvDir), Seq("g"), "value"))

  private def starQuery(swap: Boolean = false): DataFrame = {
    val f = spark.read.parquet(factDir)
    val d = spark.read.parquet(dimDir)
    val joined = if (swap) d.join(f, Seq("k")) else f.join(d, Seq("k"))
    joined.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt_q"),
        sum(col("value").cast(Dec)).as("sum_q"),
        min(col("value")).as("min_q"),
        max(col("value")).as("max_q"))
      .orderBy(col("g"))
  }

  test("star dashboard over fact ⋈ dim serves from the join-view partials") {
    val direct = starQuery().collect().toSeq
    serveWith(spark, Nil, joinDefs) {
      val plan = starQuery().queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(joinMvDir).getName),
        s"expected a scan of the join MV:\n$plan")
      assert(!plan.contains(new java.io.File(factDir).getName) &&
        !plan.contains(new java.io.File(dimDir).getName),
        s"neither base table may be scanned:\n$plan")
      // no join survives in the served plan at all
      assert(!plan.toLowerCase.contains("join"), s"served plan still joins:\n$plan")
      assert(starQuery().collect().toSeq === direct)
    }
  }

  test("join rewrite is side-order independent (dim ⋈ fact matches too)") {
    val direct = starQuery(swap = true).collect().toSeq
    serveWith(spark, Nil, joinDefs) {
      val q = starQuery(swap = true)
      assert(q.queryExecution.executedPlan.toString
        .contains(new java.io.File(joinMvDir).getName))
      assert(q.collect().toSeq === direct)
    }
  }

  test("dim-key filter rewrites (pushdown mirror + inferred IsNotNull handled)") {
    def q() = spark.read.parquet(factDir)
      .join(spark.read.parquet(dimDir), Seq("k"))
      .filter(col("g") =!= "green")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("c"), sum(col("value").cast(Dec)).as("s"))
      .orderBy(col("g"))
    val direct = q().collect().toSeq
    serveWith(spark, Nil, joinDefs) {
      assert(q().queryExecution.executedPlan.toString
        .contains(new java.io.File(joinMvDir).getName))
      assert(q().collect().toSeq === direct)
    }
  }

  test("a MULTI-ROOT scan (base + extra path) is NOT served from the MV") {
    // spark.read.parquet(base, extra) covers MORE rows than the
    // registered base — an `exists`-style path match would serve it
    // from the MV and silently drop the extra root's contribution
    val extraDir = java.nio.file.Files.createTempDirectory("graft_mv_extra").toString
    Seq(("click", "2024-01-03", 100.0)).toDF("event_type", "day", "value")
      .write.mode("overwrite").parquet(extraDir)
    val q = () => spark.read.parquet(baseDir, extraDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"), sum(col("value").cast(Dec)).as("s"))
      .orderBy(col("event_type"))
    val direct = q().collect().toSeq
    serveWith(spark, mvDefs) {
      val plan = q().queryExecution.executedPlan.toString
      assert(!plan.contains(new java.io.File(mvDir).getName),
        s"a multi-root read must NOT be answered from the MV:\n$plan")
      assert(q().collect().toSeq === direct)
    }
  }

  test("a MULTI-ROOT join side (fact + extra path) is NOT served from the join MV") {
    val extraDir = java.nio.file.Files.createTempDirectory("graft_mv_factx").toString
    Seq((1L, "px", 1000.0)).toDF("k", "pay", "value")
      .write.mode("overwrite").parquet(extraDir)
    val q = () => spark.read.parquet(factDir, extraDir)
      .join(spark.read.parquet(dimDir), Seq("k"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("c"), sum(col("value").cast(Dec)).as("s"))
      .orderBy(col("g"))
    val direct = q().collect().toSeq
    serveWith(spark, Nil, joinDefs) {
      val plan = q().queryExecution.executedPlan.toString
      assert(!plan.contains(new java.io.File(joinMvDir).getName),
        s"a multi-root fact side must NOT be answered from the join MV:\n$plan")
      assert(q().collect().toSeq === direct)
    }
  }

  test("two join MVs at different granularities: COARSEST serves; finer groupings route finer") {
    val fineDir = java.nio.file.Files.createTempDirectory("graft_mv_jfine").toString
    Incremental.partials(
      spark.read.parquet(factDir).join(spark.read.parquet(dimDir), Seq("k")),
      Seq("g", "k"), "value")
      .write.mode("overwrite").parquet(fineDir)
    // declare FINE first — selection must order by key count, not list order
    val both = Seq(
      JoinMvDef(factDir, dimDir, Seq("k"),
        spark.read.parquet(fineDir), Seq("g", "k"), "value")) ++ joinDefs
    val coarse = () => starQuery()
    val coarseDirect = coarse().collect().toSeq
    serveWith(spark, Nil, both) {
      val plan = coarse().queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(joinMvDir).getName),
        s"expected the single-key (coarsest) join partials to serve GROUP BY g:\n$plan")
      assert(!plan.contains(new java.io.File(fineDir).getName))
      assert(coarse().collect().toSeq === coarseDirect)
    }
    val fine = () => spark.read.parquet(factDir)
      .join(spark.read.parquet(dimDir), Seq("k"))
      .groupBy(col("g"), col("k"))
      .agg(count(lit(1)).as("c"), sum(col("value").cast(Dec)).as("s"))
      .orderBy(col("g"), col("k"))
    val fineDirect = fine().collect().toSeq
    serveWith(spark, Nil, both) {
      val plan = fine().queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(fineDir).getName),
        s"GROUP BY g, k needs the two-key partials:\n$plan")
      assert(fine().collect().toSeq === fineDirect)
    }
  }

  test("mixed scan + join defs in one session route each aggregate to its kind") {
    // one registration list serving a mixed dashboard: the scan-shaped
    // aggregate can never match a join def and vice versa (scanRoots
    // rejects a Join child; joinUnder rejects a bare relation), so
    // each query routes to exactly its own MV
    serveWith(spark, mvDefs, joinDefs) {
      val scanPlan = query().queryExecution.executedPlan.toString
      assert(scanPlan.contains(new java.io.File(mvDir).getName) &&
        !scanPlan.contains(new java.io.File(joinMvDir).getName),
        s"the scan aggregate must serve from the scan MV:\n$scanPlan")
      val starPlan = starQuery().queryExecution.executedPlan.toString
      assert(starPlan.contains(new java.io.File(joinMvDir).getName) &&
        !starPlan.contains(new java.io.File(mvDir).getName),
        s"the star aggregate must serve from the join MV:\n$starPlan")
    }
  }

  test("no join rewrite for: non-key filter, outer join, extra join predicate, wrong path") {
    def assertNotRewritten(df: DataFrame): Unit = serveWith(spark, Nil, joinDefs) {
      assert(!df.queryExecution.executedPlan.toString
        .contains(new java.io.File(joinMvDir).getName),
        s"must NOT serve from the join MV:\n${df.queryExecution.executedPlan}")
    }
    val f = spark.read.parquet(factDir)
    val d = spark.read.parquet(dimDir)
    // a filter on a non-key fact column: partials carry no row residue
    assertNotRewritten(f.join(d, Seq("k")).filter(col("pay") =!= "p1")
      .groupBy(col("g")).agg(count(lit(1)).as("c")))
    // outer join: unmatched rows are not in the inner-join view
    assertNotRewritten(f.join(d, Seq("k"), "left_outer")
      .groupBy(col("g")).agg(count(lit(1)).as("c")))
    // an extra non-equi predicate changes the join semantics
    assertNotRewritten(f.join(d, f("k") === d("k") && col("value") > 2.0)
      .groupBy(col("g")).agg(count(lit(1)).as("c")))
    // a different fact table at another path must not be hijacked
    val otherDir = java.nio.file.Files.createTempDirectory("graft_mv_fact2").toString
    Seq((1L, "x", 100.0)).toDF("k", "pay", "value")
      .write.mode("overwrite").parquet(otherDir)
    assertNotRewritten(spark.read.parquet(otherDir).join(d, Seq("k"))
      .groupBy(col("g")).agg(count(lit(1)).as("c")))
  }
}
