package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "attr", "v")

  test("CDC: upsert replaces, insert adds, delete removes, untouched passes") {
    val changes = Seq(
      (2L, "b2", 21.0, 5L, "U"), // update existing
      (4L, "d", 40.0, 6L, "U"),  // insert new key
      (3L, "c", 30.0, 7L, "D"))  // delete existing
      .toDF("k", "attr", "v", "seq", "op")
    val out = Cdc.applyChanges(base, changes, Seq("k"), Seq("seq"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0)))
  }

  test("CDC: the LAST change per key wins, in orderCols order") {
    val changes = Seq(
      (2L, "first", 1.0, 1L, "U"),
      (2L, "last", 2.0, 9L, "U"),
      (2L, "middle", 1.5, 5L, "D"), // overridden by seq=9 upsert
      (1L, "gone", 0.0, 3L, "U"),
      (1L, "x", 0.0, 4L, "D"))      // delete wins for k=1
      .toDF("k", "attr", "v", "seq", "op")
    val out = Cdc.applyChanges(base, changes, Seq("k"), Seq("seq"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((2L, "last", 2.0), (3L, "c", 30.0)))
  }

  test("CDC: a delete for an absent key is a no-op; re-insert after delete works") {
    val changes = Seq(
      (99L, "ghost", 0.0, 1L, "D"),   // key never existed
      (3L, "x", 0.0, 2L, "D"),
      (3L, "back", 31.0, 3L, "U"))    // re-insert after the delete
      .toDF("k", "attr", "v", "seq", "op")
    val out = Cdc.applyChanges(base, changes, Seq("k"), Seq("seq"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "back", 31.0)))
  }

  test("CDC: latestState bootstraps a snapshot from a bare changelog") {
    val log = Seq(
      (1L, "v1", 1L, "U"), (1L, "v2", 2L, "U"),
      (2L, "w1", 1L, "U"), (2L, "w2", 2L, "D"),
      (3L, "z", 1L, "U"))
      .toDF("k", "attr", "seq", "op")
    val out = Cdc.latestState(log, Seq("k"), Seq("seq"))
      .orderBy("k").select("k", "attr").as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "v2"), (3L, "z")))
  }

  test("CDC: loud contract failures — op on base, missing change columns") {
    val withOp = base.withColumn("op", lit("U"))
    val e1 = intercept[IllegalArgumentException] {
      Cdc.applyChanges(withOp, withOp, Seq("k"), Seq("v"))
    }
    assert(e1.getMessage.contains("op"))
    val narrow = Seq((1L, 1L, "U")).toDF("k", "seq", "op")
    val e2 = intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, narrow, Seq("k"), Seq("seq"))
    }
    assert(e2.getMessage.contains("missing"))
  }

  test("CDC plan: the snapshot side joins broadcast — never sort-merge-shuffled") {
    val changes = Seq((2L, "b2", 21.0, 1L, "U")).toDF("k", "attr", "v", "seq", "op")
    val merged = Cdc.applyChanges(base, changes, Seq("k"), Seq("seq"))
    merged.collect() // materialize under AQE so the final plan is real
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected the anti join to broadcast the winner keys:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"snapshot must not be shuffle-sorted for the merge:\n$plan")
  }
}
