package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark DataFrame implementation plus (where
  * SQL-expressible) an equivalent DuckDB oracle statement over the same
  * parquet tables. Column names are aliased identically on both sides —
  * the driver's compare sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Queries {
  lazy val all: Seq[Q] =
    ops.ConformanceScanAgg.all ++
      ops.ConformanceJoins.all ++
      ops.ConformanceWindows.all ++
      ops.ConformanceSqlFns.all ++
      etl.EtlQueries.all ++
      sources.SourceQueries.all ++
      streaming.StreamQueries.all ++
      ext.ExtQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
