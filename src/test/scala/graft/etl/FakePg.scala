package graft.etl

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverPropertyInfo, PreparedStatement, ResultSet, ResultSetMetaData, SQLException, Statement, Types}
import java.util.Properties
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** A statement-capturing fake PostgreSQL JDBC endpoint (test-only).
  *
  * No PostgreSQL driver or server exists in this zero-egress container
  * (VERDICT r6 item 4; the H2 fallback jar is absent from the offline
  * cache too), but the loader's PG-dialect BEHAVIOR is still testable
  * offline: a `jdbc:postgresql:` URL resolves Spark's real
  * PostgresDialect for DDL/type mapping and quoting, while this driver
  * records every statement the loader + Spark's JDBC writer would send
  * to the wire. PgDialectSpec then asserts the captured SQL against the
  * reference's PG contract (reference src/loaders/postgresql.py:77-107,
  * sql/init.sql) — grammar-true even though nothing executes.
  *
  * The catalog is a name -> columns map seeded by each test; DROP
  * mutates it, CREATE TABLE registers, TRUNCATE keeps it. Everything
  * else answers JDBC-interface defaults through a reflective proxy.
  */
object FakePg {
  final case class Col(name: String, jdbcType: Int, typeName: String,
      nullable: Boolean, precision: Int = 0, scale: Int = 0)

  val url = "jdbc:postgresql://fake-host:5432/fake"
  private val stmts = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
  private val catalog = new ConcurrentHashMap[String, Seq[Col]]()

  def reset(): Unit = { stmts.clear(); catalog.clear() }
  def recorded: Seq[String] = stmts.asScala.toList
  def seed(table: String, cols: Seq[Col]): Unit = catalog.put(table.toLowerCase, cols)
  def has(table: String): Boolean = catalog.containsKey(table.toLowerCase)

  /** Register the driver once per JVM. */
  lazy val register: Unit = java.sql.DriverManager.registerDriver(new FakePgDriver)

  // ---- reflective proxy plumbing ----

  private def default(c: Class[_]): AnyRef = c match {
    case java.lang.Boolean.TYPE   => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE   => Integer.valueOf(0)
    case java.lang.Long.TYPE      => java.lang.Long.valueOf(0L)
    case java.lang.Short.TYPE     => java.lang.Short.valueOf(0.toShort)
    case java.lang.Byte.TYPE      => java.lang.Byte.valueOf(0.toByte)
    case java.lang.Double.TYPE    => java.lang.Double.valueOf(0.0)
    case java.lang.Float.TYPE     => java.lang.Float.valueOf(0.0f)
    case java.lang.Character.TYPE => java.lang.Character.valueOf(' ')
    case _                        => null
  }

  private def make[A](iface: Class[A])(
      pf: PartialFunction[(String, Seq[AnyRef]), AnyRef]): A =
    Proxy.newProxyInstance(getClass.getClassLoader, Array[Class[_]](iface),
      new InvocationHandler {
        override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val a = Option(args).map(_.toSeq).getOrElse(Seq.empty)
          (m.getName, a) match {
            case ("hashCode", Seq()) => Integer.valueOf(System.identityHashCode(proxy))
            case ("equals", Seq(o))  => java.lang.Boolean.valueOf(proxy eq o)
            case ("toString", Seq()) => s"FakePg(${iface.getSimpleName})"
            case key if pf.isDefinedAt(key) => pf(key)
            case _ => default(m.getReturnType)
          }
        }
      }).asInstanceOf[A]

  // ---- result sets ----

  private def emptyRs(meta: Option[ResultSetMetaData] = None): ResultSet =
    make(classOf[ResultSet]) {
      case ("next", _)                        => java.lang.Boolean.FALSE
      case ("getMetaData", _) if meta.nonEmpty => meta.get
      case ("wasNull", _)                     => java.lang.Boolean.FALSE
    }

  private def countRs(n: Long): ResultSet = {
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    make(classOf[ResultSet]) {
      case ("next", _)    => java.lang.Boolean.valueOf(!done.getAndSet(true))
      case ("getLong", _) => java.lang.Long.valueOf(n)
      case ("getInt", _)  => Integer.valueOf(n.toInt)
      case ("wasNull", _) => java.lang.Boolean.FALSE
    }
  }

  /** Row-list result set for DatabaseMetaData.getTables/getColumns. */
  private def rowsRs(rows: Seq[Map[String, String]]): ResultSet = {
    val it = rows.iterator
    val cur = new java.util.concurrent.atomic.AtomicReference[Map[String, String]]()
    make(classOf[ResultSet]) {
      case ("next", _) =>
        java.lang.Boolean.valueOf(if (it.hasNext) { cur.set(it.next()); true } else false)
      case ("getString", Seq(label: String)) => cur.get.getOrElse(label, null)
      case ("wasNull", _)                    => java.lang.Boolean.FALSE
    }
  }

  private def rsMeta(cols: Seq[Col]): ResultSetMetaData =
    make(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _)          => Integer.valueOf(cols.size)
      case ("getColumnLabel", Seq(i))     => cols(asInt(i) - 1).name
      case ("getColumnName", Seq(i))      => cols(asInt(i) - 1).name
      case ("getColumnType", Seq(i))      => Integer.valueOf(cols(asInt(i) - 1).jdbcType)
      case ("getColumnTypeName", Seq(i))  => cols(asInt(i) - 1).typeName
      case ("getPrecision", Seq(i))       => Integer.valueOf(cols(asInt(i) - 1).precision)
      case ("getScale", Seq(i))           => Integer.valueOf(cols(asInt(i) - 1).scale)
      case ("isSigned", _)                => java.lang.Boolean.TRUE
      case ("isNullable", Seq(i)) => Integer.valueOf(
        if (cols(asInt(i) - 1).nullable) ResultSetMetaData.columnNullable
        else ResultSetMetaData.columnNoNulls)
    }

  private def asInt(a: AnyRef): Int = a.asInstanceOf[java.lang.Integer].intValue()

  // ---- SQL routing ----

  private val SelectOne = """(?is)\s*SELECT\s+1\s+FROM\s+(\S+)\s+WHERE\s+1\s*=\s*0\s*""".r
  private val SelectStar = """(?is)\s*SELECT\s+\*\s+FROM\s+(\S+)\s+WHERE\s+1\s*=\s*0\s*""".r
  private val CountStar = """(?is)\s*SELECT\s+COUNT\(\*\)\s+FROM\s+(\S+)\s*""".r
  private val DropTable = """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\S+?)(?:\s+CASCADE)?\s*""".r
  private val CreateTable = """(?is)\s*CREATE\s+TABLE\s+(\S+)\s*\(.*""".r

  private def record(sql: String): Unit = { stmts.add(sql); () }

  private def query(sql: String): ResultSet = {
    record(sql)
    sql match {
      case SelectOne(t) =>
        if (has(t)) emptyRs() else throw new SQLException(s"""relation "$t" does not exist""", "42P01")
      case SelectStar(t) =>
        catalog.asScala.get(t.toLowerCase) match {
          case Some(cols) => emptyRs(Some(rsMeta(cols)))
          case None       => throw new SQLException(s"""relation "$t" does not exist""", "42P01")
        }
      case CountStar(t) =>
        if (has(t)) countRs(0L) else throw new SQLException(s"""relation "$t" does not exist""", "42P01")
      case _ => emptyRs()
    }
  }

  private def update(sql: String): Int = {
    record(sql)
    sql match {
      case DropTable(t)   => catalog.remove(t.toLowerCase); 0
      case CreateTable(t) => catalog.put(t.toLowerCase, Seq.empty); 0
      case _              => 0
    }
  }

  private def statement(): Statement = make(classOf[Statement]) {
    case ("execute", Seq(sql: String))       => update(sql); java.lang.Boolean.FALSE
    case ("executeUpdate", Seq(sql: String)) => Integer.valueOf(update(sql))
    case ("executeQuery", Seq(sql: String))  => query(sql)
    case ("getConnection", _)                => connection()
  }

  private def prepared(sql: String): PreparedStatement = {
    // the prepared text itself is part of the wire grammar (INSERT shape)
    record(sql)
    make(classOf[PreparedStatement]) {
      case ("executeQuery", Seq())  => query(sql)
      case ("executeQuery", Seq(s: String)) => query(s)
      case ("execute", Seq())       => java.lang.Boolean.FALSE
      case ("executeUpdate", Seq()) => Integer.valueOf(0)
      case ("executeBatch", Seq())  => Array.empty[Int]
      case ("getConnection", _)     => connection()
    }
  }

  /** Strip the driver's LIKE-escape from DatabaseMetaData patterns. */
  private def unlike(p: AnyRef): Option[String] =
    Option(p).map(_.asInstanceOf[String].replace("\\", "").toLowerCase)

  private def dbMeta(): DatabaseMetaData = make(classOf[DatabaseMetaData]) {
    case ("getSearchStringEscape", _) => "\\"
    case ("getTables", Seq(_, sch, tab, _)) =>
      val want = (unlike(sch), unlike(tab)) match {
        case (Some(s), Some(t)) => s"$s.$t"
        case (None, Some(t))    => t
        case _                  => ""
      }
      rowsRs(catalog.asScala.keys.filter(_ == want).map(k =>
        Map("TABLE_NAME" -> k.split('.').last)).toSeq)
    case ("getColumns", Seq(_, _, tab, _)) =>
      val t = unlike(tab).getOrElse("")
      val cols = catalog.asScala.collect {
        case (k, cs) if k == t || k.split('.').last == t => cs
      }.headOption.getOrElse(Seq.empty)
      rowsRs(cols.map(c => Map(
        "COLUMN_NAME" -> c.name,
        "IS_NULLABLE" -> (if (c.nullable) "YES" else "NO"))))
    case ("getURL", _) => url
    case ("getDatabaseProductName", _) => "PostgreSQL"
  }

  private[etl] def connection(): Connection = make(classOf[Connection]) {
    case ("createStatement", _)               => statement()
    case ("prepareStatement", sql +: _)       => prepared(sql.asInstanceOf[String])
    case ("getMetaData", _)                   => dbMeta()
    case ("getAutoCommit", _)                 => java.lang.Boolean.TRUE
    case ("isValid", _)                       => java.lang.Boolean.TRUE
    case ("isClosed", _)                      => java.lang.Boolean.FALSE
  }
}

/** Real (non-proxy) Driver class: Spark's DriverRegistry instantiates it
  * by class name, so it needs a public no-arg constructor. */
class FakePgDriver extends Driver {
  override def acceptsURL(u: String): Boolean = u != null && u.startsWith("jdbc:postgresql:")
  override def connect(u: String, info: Properties): Connection =
    if (acceptsURL(u)) FakePg.connection() else null
  override def getPropertyInfo(u: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getMajorVersion: Int = 42
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
