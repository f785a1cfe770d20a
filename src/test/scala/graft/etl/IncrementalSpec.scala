package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def rows(xs: (String, Double)*): DataFrame =
    xs.toDF("g", "v")

  private def served(p: DataFrame): Seq[(String, Long, Double, Double, Double, Double)] =
    Incremental.serve(p).orderBy("g")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq

  test("incremental merge equals full recompute, bit for bit") {
    val hist = rows("a" -> 1.25, "a" -> 2.5, "b" -> 10.0)
    val delta = rows("a" -> 4.125, "b" -> -3.0, "c" -> 0.75)
    val incremental = Incremental.merge(Seq("g"),
      Incremental.partials(hist, Seq("g"), "v"),
      Incremental.partials(delta, Seq("g"), "v"))
    val full = Incremental.partials(hist.unionByName(delta), Seq("g"), "v")
    assert(served(incremental) === served(full))
  }

  test("merge is associative and commutative across any batch grouping") {
    val a = Incremental.partials(rows("x" -> 1.0, "y" -> 2.0), Seq("g"), "v")
    val b = Incremental.partials(rows("x" -> 3.0), Seq("g"), "v")
    val c = Incremental.partials(rows("y" -> 4.0, "z" -> 5.0), Seq("g"), "v")
    val leftFold = Incremental.merge(Seq("g"), Incremental.merge(Seq("g"), a, b), c)
    val rightFold = Incremental.merge(Seq("g"), a, Incremental.merge(Seq("g"), b, c))
    val flat = Incremental.merge(Seq("g"), c, b, a)
    assert(served(leftFold) === served(rightFold))
    assert(served(leftFold) === served(flat))
  }

  test("derived avg is sum/count — not average-of-averages — on uneven batches") {
    // batch1: one row of 10; batch2: three rows of 1 → true mean 3.25,
    // average-of-averages would claim (10 + 1) / 2 = 5.5
    val m = Incremental.merge(Seq("g"),
      Incremental.partials(rows("g1" -> 10.0), Seq("g"), "v"),
      Incremental.partials(rows("g1" -> 1.0, "g1" -> 1.0, "g1" -> 1.0), Seq("g"), "v"))
    val Seq((_, cnt, sumV, avgV, minV, maxV)) = served(m)
    assert(cnt === 4L)
    assert(sumV === 13.0)
    assert(avgV === 3.25)
    assert(minV === 1.0)
    assert(maxV === 10.0)
  }

  test("keys absent from one side survive the merge unchanged") {
    val m = Incremental.merge(Seq("g"),
      Incremental.partials(rows("only_hist" -> 7.0), Seq("g"), "v"),
      Incremental.partials(rows("only_delta" -> 9.0), Seq("g"), "v"))
    assert(served(m).map(r => (r._1, r._2, r._3)) ===
      Seq(("only_delta", 1L, 9.0), ("only_hist", 1L, 7.0)))
  }

  test("joinDelta: view ∪ delta equals the full recompute, all three legs carrying") {
    import spark.implicits._
    val aOld = Seq((1, "a1"), (2, "a2")).toDF("k", "av")
    val aNew = Seq((3, "a3")).toDF("k", "av")
    val bOld = Seq((1, 10.0), (3, 30.0)).toDF("k", "bv") // 3 pre-arrives: ΔA⋈B_old leg
    val bNew = Seq((2, 20.0), (3, 31.0)).toDF("k", "bv") // A_old⋈ΔB and ΔA⋈ΔB legs
    val view = aOld.join(bOld, Seq("k"))
    val maintained = view
      .unionByName(Incremental.joinDelta(aOld, aNew, bOld, bNew, Seq("k")))
      .orderBy("k", "bv").collect().toSeq
    val recomputed = aOld.unionByName(aNew).join(bOld.unionByName(bNew), Seq("k"))
      .orderBy("k", "bv").collect().toSeq
    assert(maintained === recomputed)
    assert(maintained.size === 4) // (1,10) (2,20) (3,30) (3,31)
  }

  test("joinDelta: empty deltas contribute nothing") {
    import spark.implicits._
    val a = Seq((1, "a1")).toDF("k", "av")
    val b = Seq((1, 10.0)).toDF("k", "bv")
    assert(Incremental.joinDelta(a, a.limit(0), b, b.limit(0), Seq("k")).count() === 0L)
  }

  test("joinDelta: big sides join against BROADCAST deltas (no big-side exchange)") {
    import spark.implicits._
    val a = Seq((1, "a1")).toDF("k", "av")
    val b = Seq((1, 10.0)).toDF("k", "bv")
    val plan = Incremental.joinDelta(a, a, b, b, Seq("k"))
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"deltas must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no big-side shuffle join:\n$plan")
  }

  test("joinDelta: broadcastDeltas=false drops the hint and still matches (bulk backfill)") {
    import spark.implicits._
    val aOld = Seq((1, "a1"), (2, "a2")).toDF("k", "av")
    val aNew = Seq((3, "a3")).toDF("k", "av")
    val bOld = Seq((1, 10.0), (3, 30.0)).toDF("k", "bv")
    val bNew = Seq((2, 20.0), (3, 31.0)).toDF("k", "bv")
    val hinted = Incremental.joinDelta(aOld, aNew, bOld, bNew, Seq("k"))
      .orderBy("k", "bv").collect().toSeq
    val unhinted = Incremental.joinDelta(aOld, aNew, bOld, bNew, Seq("k"),
        broadcastDeltas = false)
      .orderBy("k", "bv").collect().toSeq
    assert(unhinted === hinted)
    // the unhinted logical plan carries no broadcast hint — AQE is free
    // to pick the join for a bulk-sized delta
    val logical = Incremental.joinDelta(aOld, aNew, bOld, bNew, Seq("k"),
        broadcastDeltas = false)
      .queryExecution.analyzed.toString
    assert(!logical.contains("UnresolvedHint") && !logical.toLowerCase.contains("broadcast"),
      s"no broadcast hint expected in the bulk arm:\n$logical")
  }

  test("applyFeed: insert adds, delete retracts, group-moving update relocates") {
    import spark.implicits._
    import graft.etl.Cdc
    // groups derive from the value band (v div 10), so the k=2 update
    // MOVES its row from band 1 to band 2
    def snap(rows: Seq[(Long, Double)]) = rows.toDF("k", "v")
      .select(col("k"), (col("v") / 10.0).cast("long").as("band"), col("v"))
    val before = snap(Seq((1L, 5.0), (2L, 15.0), (3L, 15.5), (4L, 25.0)))
    val after = snap(Seq((1L, 5.0), (2L, 21.0), (3L, 15.5), (5L, 7.0)))
    val feed = Cdc.snapshotDiffFull(before, after, Seq("k"))
    val maintained = Incremental.applyFeed(
        Incremental.retractablePartials(before, Seq("band"), "v"),
        feed, Seq("band"), "v")
      .orderBy("band")
      .select(col("band"), col("cnt"), col("sum_v").cast("double"))
      .as[(Long, Long, Double)].collect().toSeq
    val recomputed = Incremental.retractablePartials(after, Seq("band"), "v")
      .orderBy("band")
      .select(col("band"), col("cnt"), col("sum_v").cast("double"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(maintained === recomputed)
    // band 2 gained k=2 (21.0); band 0 gained k=5 and kept k=1; the
    // fully-emptied band (k=4's 25.0 → band 2? no: 25.0 is band 2 —
    // deleted) leaves no zero-count residue
    assert(maintained === Seq((0L, 2L, 12.0), (1L, 1L, 15.5), (2L, 1L, 21.0)))
  }

  test("applyFeed: rejects a feed without full before-images, loudly") {
    import spark.implicits._
    // a keys-only diff (no band_before/v_before twins) must fail the
    // require with a pointer at snapshotDiffFull, not an opaque
    // AnalysisException deep in the select
    val partials = Incremental.retractablePartials(
      Seq((1L, 0L, 1.0)).toDF("k", "band", "v"), Seq("band"), "v")
    val badFeed = Seq(("U", 1L, 0L, 2.0)).toDF("op", "k", "band", "v")
    val e = intercept[IllegalArgumentException] {
      Incremental.applyFeed(partials, badFeed, Seq("band"), "v")
    }
    assert(e.getMessage.contains("snapshotDiffFull") &&
      e.getMessage.contains("band_before"))
  }

  test("applyFeed: an unknown op code fails at execution, never double-counts") {
    import spark.implicits._
    // Debezium-style lowercase 'u' passes both =!= "I" and =!= "D"
    // filters — without the guard it would be silently treated as an
    // update; with it the run fails with a pointed message
    val partials = Incremental.retractablePartials(
      Seq((1L, 0L, 1.0)).toDF("k", "band", "v"), Seq("band"), "v")
    val feed = Seq(("u", 1L, 0L, 2.0, 0L, 1.0))
      .toDF("op", "k", "band", "v", "band_before", "v_before")
    val e = intercept[Throwable] {
      Incremental.applyFeed(partials, feed, Seq("band"), "v").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("unknown op")),
      s"expected the unknown-op raise, got: $e")
  }

  test("applyJoinFeed: maintained join view equals recompute under I/U/D") {
    import spark.implicits._
    import graft.etl.Cdc
    // A rows keyed by id, joining B on k; the id=2 update MOVES the row
    // to a different join key (old matches leave, new ones enter), id=3
    // is deleted, id=5 inserted; k=20 fans out to TWO B rows
    val b = Seq((10L, "x"), (20L, "y"), (20L, "z"), (30L, "w"))
      .toDF("k", "bv")
    def aSnap(rows: Seq[(Long, Long, Double)]) = rows.toDF("id", "k", "v")
    val aBefore = aSnap(Seq((1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 20L, 3.0), (4L, 20L, 4.0)))
    val aAfter = aSnap(Seq((1L, 10L, 1.0), (2L, 30L, 2.5), (4L, 20L, 4.0), (5L, 20L, 5.0)))
    val view = aBefore.join(b, Seq("k"))
    val feed = Cdc.snapshotDiffFull(aBefore, aAfter, Seq("id"))
    val maintained = Incremental.applyJoinFeed(view, feed, b, Seq("k"), Seq("id"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("k"), col("v"), col("bv"))
      .orderBy("id", "bv").collect().toSeq
    assert(canon(maintained) === canon(aAfter.join(b, Seq("k"))))
    // the big sides are never exchanged: BOTH maintenance legs (the
    // anti join removing old matches from the view and the inner join
    // deriving the new ones from B) are broadcast joins. The feed
    // DERIVATION (snapshotDiffFull's full-outer over the two small A
    // snapshots) may shuffle — that's upstream of the maintenance and
    // scales with A's diff inputs, not with the view or B.
    val plan = maintained.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"the leave leg must be a broadcast anti join:\n$plan")
    assert("BroadcastHashJoin \\[k#\\d+L?\\]".r.findFirstIn(plan).isDefined,
      s"the enter leg must broadcast-join B on the join key:\n$plan")
  }

  test("applyJoinFeed: rejects feeds whose images lack the join key") {
    import spark.implicits._
    val view = Seq((1L, 10L, "x")).toDF("id", "k", "bv")
    val b = Seq((10L, "x")).toDF("k", "bv")
    val feed = Seq(("U", 1L, 2.0, 1.0)).toDF("op", "id", "v", "v_before")
    val e = intercept[IllegalArgumentException] {
      Incremental.applyJoinFeed(view, feed, b, Seq("k"), Seq("id"))
    }
    assert(e.getMessage.contains("FULL-IMAGE feed"))
  }

  test("applyFeed: a group emptied by deletes disappears (no zero-count rows)") {
    import spark.implicits._
    import graft.etl.Cdc
    def snap(rows: Seq[(Long, Double)]) = rows.toDF("k", "v")
      .select(col("k"), lit(0L).as("band"), col("v"))
    val before = snap(Seq((1L, 1.0), (2L, 2.0)))
    val after = before.limit(0)
    val feed = Cdc.snapshotDiffFull(before, after, Seq("k"))
    assert(Incremental.applyFeed(
      Incremental.retractablePartials(before, Seq("band"), "v"),
      feed, Seq("band"), "v").count() === 0L)
  }

  test("delta merge never rescans history: the stored MV enters as a leaf") {
    // the maintained aggregate is a stored table in production — model it
    // as a lineage-cut frame; the merge plan must read it as a LEAF
    // (LogicalRDD) and re-aggregate, never re-derive it from raw history
    val hist = Incremental.partials(rows("a" -> 1.0), Seq("g"), "v")
      .localCheckpoint(eager = true)
    val delta = Incremental.partials(rows("a" -> 2.0), Seq("g"), "v")
    val plan = Incremental.merge(Seq("g"), hist, delta)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD"), s"stored MV must be a leaf:\n$plan")
    assert(plan.contains("Aggregate"), s"merge must re-aggregate partials:\n$plan")
  }
}
