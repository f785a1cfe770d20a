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
}
