package graft.etl

import graft.{SparkSpec, Tables => T}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The durable serving contract (reference sql/init.sql:31-56): the
  * `costs` view must survive a restart, not just a session. Each
  * "restart" here is a brand-new SparkSession with its OWN SharedState
  * (fresh in-memory catalog state) over the same persistent Derby
  * metastore — the only way the second session can resolve `costs` is
  * by reading the DDL back from the metastore, exactly what a new
  * process would do. */
class DurableCatalogSpec extends SparkSpec {

  test("durable costs view survives a session restart via the persistent metastore") {
    val shared = spark // materialize the shared session/context first
    val meta = Files.createTempDirectory("graft_meta").toString
    val wh = Files.createTempDirectory("graft_wh").toString

    def restart(): SparkSession = {
      // a cleared active/default forces getOrCreate to construct a NEW
      // SparkSession (new SharedState = new catalog cache) over the
      // existing local context, booting its catalog from the metastore
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      Sessions.durableCatalog(SparkSession.builder(), meta).getOrCreate()
    }

    try {
      // ---- session 1: load a normalized table, create the durable view
      val s1 = restart()
      val loader = new ParquetLoader(wh, "s")
      loader.ensureNamespace()
      val normalized = Normalize.normalize(
        T.events(s1, sf001), Normalize.eventsMirror, "cur_a",
        to_timestamp(lit("2024-06-01 00:00:00")))
      val n = loader.load(normalized, "cur_a_normalized", "replace")
      assert(n > 0)
      CostsView.createDurable(s1, Seq(loader.sqlRef("cur_a_normalized").get))
      assert(s1.sql("SELECT count(*) FROM costs").collect().head.getLong(0) == n)

      // ---- session 2: fresh catalog state, same metastore — the view
      // must resolve from the persisted DDL and serve the D1 shape
      val s2 = restart()
      assert(s2 ne s1)
      assert(s2.catalog.tableExists("costs"),
        "view DDL must come back from the metastore in a new session")
      val d1 = s2.sql(
        """SELECT service, CAST(SUM(CAST(cost AS DECIMAL(38,6))) AS DOUBLE) AS total
           FROM costs WHERE date >= DATE '2024-01-10'
           GROUP BY service ORDER BY total DESC""").collect()
      assert(d1.length > 0 && d1.forall(_.getDouble(1) > 0))

      // CREATE OR REPLACE is idempotent across restarts too
      CostsView.createDurable(s2, Seq(loader.sqlRef("cur_a_normalized").get))
      assert(s2.sql("SELECT count(*) FROM costs").collect().head.getLong(0) == n)
    } finally {
      // hand the shared session back to the other suites
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("registered MV definition survives a restart and serves the rewrite") {
    import graft.plans.MaterializedView
    val shared = spark
    val meta = Files.createTempDirectory("graft_meta_mv").toString
    val baseDir = Files.createTempDirectory("graft_mv_base_d").toString + "/events"
    val mvDir = Files.createTempDirectory("graft_mv_state_d").toString + "/partials"

    def restart(): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      Sessions.durableCatalog(SparkSession.builder(), meta).getOrCreate()
    }

    try {
      // ---- session 1: base data, maintained partials, registration
      val s1 = restart()
      import s1.implicits._
      Seq(("click", 1L, 1.5), ("click", 2L, 2.5), ("view", 1L, 8.0), ("view", 3L, 0.5))
        .toDF("event_type", "user_id", "value")
        .write.mode("overwrite").parquet(baseDir)
      Incremental.partials(s1.read.parquet(baseDir), Seq("event_type", "user_id"), "value")
        .write.mode("overwrite").parquet(mvDir)
      MaterializedView.register(s1, "mv_events", mvDir,
        baseDir, Seq("event_type", "user_id"), "value")

      // ---- session 2: fresh catalog state — the MvDef must come back
      // from the metastore and the rewrite must fire
      val s2 = restart()
      assert(s2 ne s1)
      def rollup() = s2.read.parquet(baseDir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(graft.Qh.Dec)).as("total"))
        .orderBy(col("event_type"))
      val direct = rollup().collect().toSeq
      MaterializedView.serveFromCatalog(s2, Seq("mv_events")) {
        val plan = rollup().queryExecution.executedPlan.toString
        assert(plan.contains("partials") && !plan.contains("graft_mv_base_d"),
          s"expected the restarted session to serve from the MV:\n$plan")
        assert(rollup().collect().toSeq === direct)
      }
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("registered JOIN-MV definition survives a restart and serves the star rollup") {
    import graft.plans.MaterializedView
    val shared = spark
    val meta = Files.createTempDirectory("graft_meta_jmv").toString
    val factDir = Files.createTempDirectory("graft_jmv_fact_d").toString + "/fact"
    val dimDir = Files.createTempDirectory("graft_jmv_dim_d").toString + "/dim"
    val mvDir = Files.createTempDirectory("graft_jmv_state_d").toString + "/jpartials"

    def restart(): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      Sessions.durableCatalog(SparkSession.builder(), meta).getOrCreate()
    }

    try {
      // ---- session 1: bases, join-view partials, registration
      val s1 = restart()
      import s1.implicits._
      Seq((1L, 1.5), (1L, 2.5), (2L, 4.0), (3L, 8.0))
        .toDF("k", "value").write.mode("overwrite").parquet(factDir)
      Seq((1L, "red"), (2L, "red"), (3L, "blue"))
        .toDF("k", "g").write.mode("overwrite").parquet(dimDir)
      Incremental.partials(
        s1.read.parquet(factDir).join(s1.read.parquet(dimDir), Seq("k")),
        Seq("g"), "value")
        .write.mode("overwrite").parquet(mvDir)
      MaterializedView.registerJoin(s1, "mv_star", mvDir,
        factDir, dimDir, Seq("k"), Seq("g"), "value")

      // ---- session 2: the JoinMvDef must come back from the
      // metastore (serveFromCatalog auto-detects the join shape) and
      // the star dashboard must serve without touching either base
      val s2 = restart()
      def star() = s2.read.parquet(factDir)
        .join(s2.read.parquet(dimDir), Seq("k"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(graft.Qh.Dec)).as("total"))
        .orderBy(col("g"))
      val direct = star().collect().toSeq
      MaterializedView.serveFromCatalog(s2, Seq("mv_star")) {
        val plan = star().queryExecution.executedPlan.toString
        assert(plan.contains("jpartials") && !plan.contains("graft_jmv_fact_d") &&
          !plan.contains("graft_jmv_dim_d"),
          s"expected the restarted session to serve the star from the join MV:\n$plan")
        assert(star().collect().toSeq === direct)
      }
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("a MIXED catalog (scan MV + join MV) restarts and routes each aggregate to its kind") {
    import graft.plans.MaterializedView
    val shared = spark
    val meta = Files.createTempDirectory("graft_meta_mix").toString
    val baseDir = Files.createTempDirectory("graft_mix_base_d").toString + "/events"
    val factDir = Files.createTempDirectory("graft_mix_fact_d").toString + "/fact"
    val dimDir = Files.createTempDirectory("graft_mix_dim_d").toString + "/dim"
    val scanMvDir = Files.createTempDirectory("graft_mix_scanmv_d").toString + "/spartials"
    val joinMvDir = Files.createTempDirectory("graft_mix_joinmv_d").toString + "/jpartials"

    def restart(): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      Sessions.durableCatalog(SparkSession.builder(), meta).getOrCreate()
    }

    try {
      // ---- session 1: register one MV of each kind in one metastore
      val s1 = restart()
      import s1.implicits._
      Seq(("click", 1.5), ("click", 2.5), ("view", 8.0))
        .toDF("event_type", "value").write.mode("overwrite").parquet(baseDir)
      Seq((1L, 1.5), (1L, 2.5), (2L, 4.0))
        .toDF("k", "value").write.mode("overwrite").parquet(factDir)
      Seq((1L, "red"), (2L, "blue")).toDF("k", "g")
        .write.mode("overwrite").parquet(dimDir)
      Incremental.partials(s1.read.parquet(baseDir), Seq("event_type"), "value")
        .write.mode("overwrite").parquet(scanMvDir)
      Incremental.partials(
        s1.read.parquet(factDir).join(s1.read.parquet(dimDir), Seq("k")),
        Seq("g"), "value")
        .write.mode("overwrite").parquet(joinMvDir)
      MaterializedView.register(s1, "mv_mix_scan", scanMvDir,
        baseDir, Seq("event_type"), "value")
      MaterializedView.registerJoin(s1, "mv_mix_star", joinMvDir,
        factDir, dimDir, Seq("k"), Seq("g"), "value")

      // ---- session 2: BOTH definitions come back from the metastore
      // in ONE serveFromCatalog list; each aggregate routes to its kind
      val s2 = restart()
      def scanQ() = s2.read.parquet(baseDir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(col("value").cast(graft.Qh.Dec)).as("total"))
        .orderBy(col("event_type"))
      def starQ() = s2.read.parquet(factDir)
        .join(s2.read.parquet(dimDir), Seq("k"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("cnt"), sum(col("value").cast(graft.Qh.Dec)).as("total"))
        .orderBy(col("g"))
      val scanDirect = scanQ().collect().toSeq
      val starDirect = starQ().collect().toSeq
      MaterializedView.serveFromCatalog(s2, Seq("mv_mix_scan", "mv_mix_star")) {
        val sp = scanQ().queryExecution.executedPlan.toString
        assert(sp.contains("spartials") && !sp.contains("graft_mix_base_d") &&
          !sp.contains("jpartials"),
          s"the scan aggregate must serve from the scan MV after restart:\n$sp")
        val jp = starQ().queryExecution.executedPlan.toString
        assert(jp.contains("jpartials") && !jp.contains("graft_mix_fact_d") &&
          !jp.contains("graft_mix_dim_d") && !jp.contains("spartials"),
          s"the star aggregate must serve from the join MV after restart:\n$jp")
        assert(scanQ().collect().toSeq === scanDirect)
        assert(starQ().collect().toSeq === starDirect)
      }
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
