package graft.etl

/** Environment-driven engine configuration — mirror of the reference's
  * dataclass config (reference src/config.py:31-61): CSV-parsed source
  * path list, same defaulting discipline, all keys overridable.
  *
  * The reference is S3+PostgreSQL-specific; here the source root is any
  * Hadoop-visible URI (file:// locally, s3a:// on a cluster — same code
  * path in Spark) and the serving sink is either a JDBC database (when
  * JDBC_URL is set) or a parquet warehouse directory.
  */
final case class EngineConfig(
    sourceRoot: String,
    curPaths: Seq[String],
    warehouseDir: String,
    jdbcUrl: Option[String],
    jdbcUser: String,
    jdbcPassword: String,
    schema: String,
    syncMonths: Int,
    logLevel: String,
    // when set, the session boots a persistent (Derby-backed Hive)
    // metastore rooted here, so catalog DDL — the durable `costs` view —
    // survives restarts, matching the reference's persistent PG view
    // (sql/init.sql:31-56). None = default in-memory catalog.
    metastoreDir: Option[String] = None)

object EngineConfig {

  /** Build from an env map (config.py:38-61 semantics: CSV split on
    * commas, blanks dropped, defaults for everything optional). */
  def fromEnv(env: Map[String, String] = sys.env): EngineConfig = {
    val curPaths = env.getOrElse("CUR_PATHS", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    EngineConfig(
      sourceRoot = env.getOrElse("SOURCE_ROOT", "file:///data/cur"),
      curPaths = curPaths,
      warehouseDir = env.getOrElse("WAREHOUSE_DIR", "/tmp/graft-warehouse"),
      jdbcUrl = env.get("JDBC_URL").filter(_.nonEmpty),
      jdbcUser = env.getOrElse("JDBC_USER", ""),
      jdbcPassword = env.getOrElse("JDBC_PASSWORD", ""),
      schema = env.getOrElse("DB_SCHEMA", "cost_analytics"),
      syncMonths = env.getOrElse("SYNC_MONTHS", "1").toInt,
      logLevel = env.getOrElse("LOG_LEVEL", "WARN"),
      metastoreDir = env.get("METASTORE_DIR").filter(_.nonEmpty))
  }
}
