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
    metastoreDir: Option[String] = None,
    // object-store access configuration (reference config.py:45-49 +
    // the DuckDB httpfs setup of aws_cur.py:44-54): flows into
    // `fs.s3a.*` Hadoop confs so `s3a://` source roots and warehouses
    // work unchanged — same engine code path as file://.
    s3: S3Config = S3Config.empty) {

  /** The `fs.s3a.*` Hadoop configuration this engine config implies —
    * only keys that were actually provided, so local file:// runs stay
    * untouched. Applied at session build ([[graft.Main]]) or onto a
    * live session via [[Sessions.applyS3a]]. Endpoint + path-style
    * cover S3-compatible stores (MinIO/Ceph/on-prem gateways), where
    * virtual-host addressing and the AWS endpoint default both break. */
  def s3aHadoopConf: Map[String, String] =
    (s3.accessKeyId.map("fs.s3a.access.key" -> _) ++
      s3.secretAccessKey.map("fs.s3a.secret.key" -> _) ++
      s3.region.map("fs.s3a.endpoint.region" -> _) ++
      s3.endpoint.map("fs.s3a.endpoint" -> _) ++
      s3.pathStyleAccess.map(v => "fs.s3a.path.style.access" -> v.toString)).toMap
}

/** Optional S3/object-store settings, each absent unless configured. */
final case class S3Config(
    accessKeyId: Option[String],
    secretAccessKey: Option[String],
    region: Option[String],
    endpoint: Option[String],
    pathStyleAccess: Option[Boolean])

object S3Config {
  val empty: S3Config = S3Config(None, None, None, None, None)

  def fromEnv(env: Map[String, String]): S3Config = S3Config(
    accessKeyId = env.get("AWS_ACCESS_KEY_ID").filter(_.nonEmpty),
    secretAccessKey = env.get("AWS_SECRET_ACCESS_KEY").filter(_.nonEmpty),
    region = env.get("AWS_REGION").filter(_.nonEmpty),
    endpoint = env.get("S3_ENDPOINT").filter(_.nonEmpty),
    pathStyleAccess = env.get("S3_PATH_STYLE_ACCESS").filter(_.nonEmpty)
      .map(_.trim.toLowerCase == "true"))
}

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
      metastoreDir = env.get("METASTORE_DIR").filter(_.nonEmpty),
      s3 = S3Config.fromEnv(env))
  }
}
