package graft.ext

import graft.{SparkSpec, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global rank: bit-equality with the single-partition window, layout
  * independence, and the plan guarantee that no stage collapses to one
  * partition. */
class RankingSpec extends SparkSpec {

  private def li = T.lineitem(spark, sf001).select(
    col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
    col("l_extendedprice"))
  private val order = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))

  test("globalRowNumber equals the single-partition window, at any input layout") {
    val expected = li.withColumn("rn",
      row_number().over(Window.orderBy(order: _*)).cast("long"))
      .orderBy("rn")
      .select("l_orderkey", "l_linenumber", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def got(df: org.apache.spark.sql.DataFrame, parts: Int) =
      Ranking.globalRowNumber(df, order, parts)
        .orderBy("rn").select("l_orderkey", "l_linenumber", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got(li, 4) == expected)
    assert(got(li.repartition(13), 7) == expected) // layout + parts both vary
  }

  test("pct is the rank transform: 0 at min, 1 at max, strictly increasing") {
    val pcts = Ranking.globalRowNumber(li, order, 4)
      .orderBy("rn").select("pct").collect().map(_.getDouble(0)).toSeq
    assert(pcts.head == 0.0 && pcts.last == 1.0)
    assert(pcts.zip(pcts.tail).forall { case (a, b) => a < b })
  }

  test("plan: range exchange, never a single-partition collapse") {
    // the enumeration stage is an RDD lineage (LogicalRDD hides the
    // upstream plan), so assert on the operator's data path — the
    // ranged+sorted stage it enumerates — and on the final frame
    val staged = li.repartitionByRange(4, order: _*)
      .sortWithinPartitions(order: _*)
      .queryExecution.executedPlan.toString
    assert(staged.contains("rangepartitioning"), s"expected a range exchange:\n$staged")
    assert(!staged.contains("SinglePartition"),
      s"global rank must not collapse to one partition:\n$staged")
    val finalPlan = Ranking.globalRowNumber(li, order, 4)
      .queryExecution.executedPlan.toString
    assert(!finalPlan.contains("SinglePartition"), finalPlan)
    // and the result really is 4 range partitions, not 1
    val parts = Ranking.globalRowNumber(li, order, 4)
      .select(org.apache.spark.sql.functions.spark_partition_id())
      .distinct().count()
    assert(parts == 4L)
  }
}
