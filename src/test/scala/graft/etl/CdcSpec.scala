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

  // ---------------- versioned (out-of-order-safe) apply ----------------

  private def vstate(xs: (Long, String, Long, String)*) =
    xs.toDF("k", "attr", "seq", "op")

  test("versioned apply: any batch permutation converges to global latest-wins") {
    val b1 = vstate((1L, "v3", 3L, "U"), (2L, "w5", 5L, "U"))
    val b2 = vstate((1L, "v7", 7L, "U"), (2L, "gone", 6L, "D"))
    val b3 = vstate((1L, "v5", 5L, "U"), (3L, "z1", 1L, "U"))
    val seed = vstate((1L, "v0", 0L, "U"))
    val expected = Seq((1L, "v7"), (3L, "z1")) // k=2's latest is the seq-6 delete
    for (perm <- Seq(b1, b2, b3).permutations) {
      val finalState = perm.foldLeft(seed) { (st, b) =>
        Cdc.applyChangesVersioned(st, b, Seq("k"), Seq("seq"))
      }
      val live = Cdc.liveView(finalState, Seq("seq"))
        .orderBy("k").select("k", "attr").as[(Long, String)].collect().toSeq
      assert(live === expected, s"diverged for permutation")
    }
  }

  test("versioned apply: a tombstone blocks a STALE upsert from resurrecting the key") {
    val afterDelete = Cdc.applyChangesVersioned(
      vstate((1L, "live", 5L, "U")), vstate((1L, "x", 9L, "D")),
      Seq("k"), Seq("seq"))
    val afterStale = Cdc.applyChangesVersioned(
      afterDelete, vstate((1L, "stale", 7L, "U")), Seq("k"), Seq("seq"))
    assert(Cdc.liveView(afterStale, Seq("seq")).count() === 0)
    // a genuinely NEWER upsert does resurrect it
    val afterNewer = Cdc.applyChangesVersioned(
      afterStale, vstate((1L, "back", 11L, "U")), Seq("k"), Seq("seq"))
    assert(Cdc.liveView(afterNewer, Seq("seq")).select("attr").as[String]
      .collect().toSeq === Seq("back"))
  }

  test("versioned apply: replaying the same batch is a no-op (idempotent)") {
    val batch = vstate((1L, "v1", 1L, "U"), (2L, "w2", 2L, "D"))
    val once = Cdc.applyChangesVersioned(
      vstate((2L, "w0", 0L, "U")), batch, Seq("k"), Seq("seq"))
    val twice = Cdc.applyChangesVersioned(once, batch, Seq("k"), Seq("seq"))
    val snap = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("k").as[(Long, String, Long, String)].collect().toSeq
    assert(snap(once) === snap(twice))
  }

  // ---------------- SCD2 history ----------------

  test("scd2: versions chain valid_from→valid_to, deletes close without opening") {
    val log = Seq(
      (1L, "a", "2024-01-01 00:00:00", 1L, "U"),
      (1L, "b", "2024-01-03 00:00:00", 2L, "U"),
      (1L, "x", "2024-01-05 00:00:00", 3L, "D"), // closes 'b', opens nothing
      (1L, "c", "2024-01-07 00:00:00", 4L, "U")) // re-insert: current
      .toDF("k", "attr", "tss", "seq", "op")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = Cdc.scd2History(log, Seq("k"), Seq("ts", "seq"))
      .orderBy("valid_from")
      .select(col("attr"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("is_current"))
      .as[(String, String, Option[String], Int)].collect().toSeq
    assert(out === Seq(
      ("a", "2024-01-01 00:00:00", Some("2024-01-03 00:00:00"), 0),
      ("b", "2024-01-03 00:00:00", Some("2024-01-05 00:00:00"), 0),
      ("c", "2024-01-07 00:00:00", None, 1)))
  }

  test("scd2: keys version independently") {
    val log = Seq(
      (1L, "a1", "2024-01-01 00:00:00", 1L, "U"),
      (2L, "b1", "2024-01-02 00:00:00", 2L, "U"),
      (1L, "a2", "2024-01-03 00:00:00", 3L, "U"))
      .toDF("k", "attr", "tss", "seq", "op")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = Cdc.scd2History(log, Seq("k"), Seq("ts", "seq"))
      .orderBy("k", "valid_from")
      .select("k", "attr", "is_current").as[(Long, String, Int)].collect().toSeq
    assert(out === Seq((1L, "a1", 0), (1L, "a2", 1), (2L, "b1", 1)))
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

  test("snapshotDiff: I/U/D classification, null-safe value compare, unchanged absent") {
    val before = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None, 30.0), (4L, Some("d"), 40.0))
      .toDF("k", "attr", "v")
    val after = Seq(
      (1L, Some("a"), 10.0),   // unchanged → absent from the feed
      (2L, Some("b2"), 20.0),  // U: attr changed
      (3L, None, 30.0),        // unchanged, NULL attr both sides → absent
      (5L, Some("e"), 50.0))   // I; k=4 → D
      .toDF("k", "attr", "v")
    val feed = Cdc.snapshotDiff(before, after, Seq("k"))
      .orderBy("k").as[(String, Long, Option[String], Double)].collect().toSeq
    assert(feed === Seq(
      ("U", 2L, Some("b2"), 20.0),
      ("D", 4L, Some("d"), 40.0),   // delete carries the before-image
      ("I", 5L, Some("e"), 50.0)))
  }

  test("snapshotDiff → applyChanges round-trips: feed applied to before equals after") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (4L, "d", 40.0))
      .toDF("k", "attr", "v")
    val after = Seq((1L, "a", 10.0), (2L, "b2", 21.0), (5L, "e", 50.0))
      .toDF("k", "attr", "v")
    val feed = Cdc.snapshotDiff(before, after, Seq("k"))
      // I and U are both upserts to applyChanges; any constant order works
      // (one change per key by construction of a diff)
      .withColumn("op", when(col("op") === "I", "U").otherwise(col("op")))
      .withColumn("seq", lit(1L))
    val rebuilt = Cdc.applyChanges(before, feed, Seq("k"), Seq("seq"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    val expected = after.orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(rebuilt === expected)
  }

  test("snapshotDiff plan: one key-partitioned join, no broadcast of either snapshot") {
    val before = base
    val after = base.withColumn("v", col("v") + 1.0)
    val plan = Cdc.snapshotDiff(before, after, Seq("k"))
      .queryExecution.sparkPlan.toString
    // full-outer diff must co-locate by key — SMJ (or shuffled hash),
    // exactly ONE join, and nothing collected to the driver
    assert(plan.contains("FullOuter"), s"expected a full-outer join:\n$plan")
    assert("Join".r.findAllIn(plan).size >= 1)
  }
}
