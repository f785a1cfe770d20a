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

  test("rocAuc: perfect separation 1.0, inverse 0.0, exact hand value on a mix") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Double, Boolean)]): Double =
      Ranking.rocAuc(rows.toDF("id", "score", "p"),
        Seq(col("score"), col("id")), col("p"))
        .collect().head.getAs[Double]("auc")
    // positives all score higher -> 1.0; all lower -> 0.0
    assert(auc(Seq((1L, 1.0, false), (2L, 2.0, false), (3L, 3.0, true), (4L, 4.0, true))) == 1.0)
    assert(auc(Seq((1L, 1.0, true), (2L, 2.0, true), (3L, 3.0, false), (4L, 4.0, false))) == 0.0)
    // hand value: ranks asc by score; positives at ranks 2 and 4:
    // (2+4 - 2*3/2) / (2*2) = 3/4
    assert(auc(Seq((1L, 1.0, false), (2L, 2.0, true), (3L, 3.0, false), (4L, 4.0, true))) == 0.75)
  }

  test("calibration: equal-population buckets, exact micro rates") {
    import spark.implicits._
    // 20 rows, scores 1..20; positives are the top 5 scores
    val rows = (1 to 20).map(i => (i.toLong, i.toDouble, i > 15))
    val out = Ranking.calibration(rows.toDF("id", "score", "p"),
      Seq(col("score"), col("id")), col("p"), bins = 4)
      .orderBy("bucket")
      .select("bucket", "n", "n_pos", "pos_rate_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // pct = (rn-1)/19 in [0,1]; bucket = min(floor(pct*4), 3) splits
    // 20 rows as 5/5/5/5 except the pct=1.0 row folds into bucket 3
    assert(out.map(_._2).sum == 20L)
    assert(out.map(_._1) == Seq(0L, 1L, 2L, 3L))
    // positives (scores 16..20) occupy the top bucket(s) only
    assert(out.filter(_._1 <= 1L).forall(_._3 == 0L))
    val top = out.last
    assert(top._3 > 0 && top._4 == top._3 * 1000000L / top._2)
  }

  test("pinned n=1 contract: a single row ranks 1 with pct 0.0, not NaN") {
    import spark.implicits._
    val r = Ranking.globalRowNumber(
      Seq((1L, 5.0)).toDF("id", "score"), Seq(col("score"), col("id")), 2)
      .collect().head
    assert(r.getAs[Long]("rn") == 1L)
    // 0/0 = NaN would propagate a null bucket through calibration (and
    // pre-IEEE engines error on it); the rank transform of a singleton
    // is pinned to the bottom of the scale instead
    assert(r.getAs[Double]("pct") == 0.0)
  }

  test("cache accounting: release() frees the rank checkpoint; eval rollups self-release") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ranked = Ranking.globalRowNumber(li, order, 4)
    assert(ranked.count() > 0)
    // the range-exchange checkpoint is live while the consumer acts...
    assert((sc.getPersistentRDDs.keySet -- before).nonEmpty)
    Ranking.release(ranked)
    // ...and release() after the last action leaves ZERO live entries
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
    // rocAuc/calibration reduce to bounded outputs and release their
    // own checkpoint before returning — no live entries either, and
    // the returned local frames stay actionable afterwards
    val pos = col("l_orderkey") % 2 === 0
    val auc = Ranking.rocAuc(li, order, pos)
    val cal = Ranking.calibration(li, order, pos, bins = 4)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
    assert(auc.count() == 1L && cal.count() == 4L)
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
