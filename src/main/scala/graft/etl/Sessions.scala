package graft.etl

import org.apache.spark.sql.SparkSession

/** Session-construction helpers for a catalog that SURVIVES restarts.
  *
  * The reference's serving contract is durable: its `costs` view lives in
  * PostgreSQL (reference sql/init.sql:31-56, src/main.py:124-132) and is
  * there after every restart. Spark's default in-memory catalog loses
  * view DDL with the session, so [[CostsView.createDurable]] was only as
  * durable as the process. Backing the session with a persistent
  * metastore (embedded Derby under `dir/metastore_db` — the in-sandbox
  * stand-in for a shared Hive metastore / Glue catalog on a real
  * cluster) makes the DDL genuinely durable: a NEW session pointed at
  * the same directory resolves `costs` and serves D1 with no re-sync.
  */
object Sessions {

  /** Apply persistent-metastore settings to a builder. Must run before
    * `getOrCreate` — catalog implementation and metastore URL are static
    * confs fixed at SharedState creation. */
  def durableCatalog(b: SparkSession.Builder, dir: String): SparkSession.Builder =
    b.config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$dir/warehouse")
      // embedded Derby: one metastore per directory; `create=true` boots
      // the schema on first use (the reference's init.sql role)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$dir/metastore_db;create=true")
      .config("datanucleus.schema.autoCreateAll", "true")
      .config("spark.hadoop.hive.metastore.schema.verification", "false")

  /** Apply [[EngineConfig.s3aHadoopConf]] to a LIVE session's Hadoop
    * configuration (O26 / reference aws_cur.py:44-54: credentials,
    * region, endpoint, path-style). Hadoop fs confs are read at
    * FileSystem instantiation, not session build, so setting them on a
    * running session works — library callers that receive a session
    * (rather than building one through [[graft.Main]]) use this.
    * Deliberately does NOT touch `fs.s3a.impl`: the implementation
    * binding belongs to the deployment's jars, and the offline contract
    * test binds it to a local-backed stub. */
  def applyS3a(s: SparkSession, cfg: EngineConfig): SparkSession = {
    cfg.s3aHadoopConf.foreach { case (k, v) =>
      s.sparkContext.hadoopConfiguration.set(k, v)
    }
    s
  }
}
