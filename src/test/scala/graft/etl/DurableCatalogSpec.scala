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
}
