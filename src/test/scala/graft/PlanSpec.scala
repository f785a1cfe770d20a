package graft

import org.apache.spark.sql.types.TimestampType

/** Physical-plan assertions — the scale properties the scaladoc claims
  * (broadcasts placed, filters pushed, columns pruned) proven on
  * `executedPlan`, not assumed. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Queries.byName(name).fn(spark, sf001).queryExecution.executedPlan.toString

  test("C11: dimension joins broadcast; fact-fact join is the only merge join") {
    val p = plan("c11_join_star_agg")
    // nation and region are always broadcast (tiny dims); the restricted
    // customer set is fact-derived and deliberately NOT force-broadcast
    // (the planner may still choose to at small SF). At tiny SF the
    // planner may broadcast lineitem too; at scale orders⋈lineitem is the
    // single SortMergeJoin.
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size >= 2,
      s"expected >=2 broadcast joins (nation, region):\n$p")
    assert("SortMergeJoin".r.findAllMatchIn(p).size <= 2)
  }

  test("C12: part dimension joins as broadcast, no shuffle of lineitem for the join") {
    val p = plan("c12_join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("C2: range+equality predicates are pushed into the parquet scan") {
    val p = plan("c02_filter_pred_mix")
    assert(p.contains("PushedFilters:") && p.contains("l_returnflag"),
      s"filters not pushed:\n$p")
  }

  test("C1: column pruning — scan reads only the 2 projected columns") {
    val p = plan("c01_scan_project")
    assert(p.contains("ReadSchema: struct<r_regionkey:int,r_name:string>"),
      s"scan not pruned:\n$p")
  }

  test("events loader yields a genuine timestamp column despite nanos storage") {
    val ev = Tables.events(spark, sf001)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.selectExpr("min(ts)").collect().head.getTimestamp(0) != null)
  }

  test("every declared query has a distinct name and every oracle points at one") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Queries.oracleMap.keySet.subsetOf(names.toSet))
  }
}
