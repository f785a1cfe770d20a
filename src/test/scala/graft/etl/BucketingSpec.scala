package graft.etl

import graft.{SparkSpec, Tables => T}

/** Bucketed co-located join: the fact⋈fact exchange disappears. */
class BucketingSpec extends SparkSpec {

  test("same-bucketed fact tables join without any Exchange") {
    // warehouse dir is a temp dir set statically in SparkSpec
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Bucketing.writeBucketed(T.orders(spark, sf001), "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(T.lineitem(spark, sf001), "b_lineitem", "l_orderkey", 8)
    // force the shuffle-sensitive plan: no broadcast fallback
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.colocatedJoin(spark, "b_orders", "o_orderkey", "b_lineitem", "l_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it returns the same rows as the plain join
      val o = T.orders(spark, sf001)
      val li = T.lineitem(spark, sf001)
      val plain = o.join(li, o("o_orderkey") === li("l_orderkey"))
      assert(j.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
