package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Incremental.applyJoinFeedPartials]] — the streaming-state form of
  * join-view maintenance: a full-image A-side feed folds DIRECTLY into
  * the join view's retractable partials (|keys|-row state), never
  * materializing the view. The pinned identity: folded state ≡
  * `retractablePartials(A_after ⋈ B)`, exactly — decimal partials are
  * order-free, so the identity holds per batch and per any slicing of
  * the feed (the e122 streaming contract). */
class JoinFeedPartialsSpec extends SparkSpec {
  import spark.implicits._

  // B side: key 20 FANS OUT to two dim rows; keys 4/40/50 are absent
  private def dim: DataFrame =
    Seq((1L, "red"), (2L, "red"), (3L, "blue"), (20L, "green"), (20L, "blue"))
      .toDF("k", "g")

  private def beforeA: DataFrame = Seq(
    (100L, 1L, 1.5), (101L, 1L, 2.5), (102L, 2L, 4.0),
    (103L, 3L, 8.0), (104L, 4L, 99.0), // k=4: unmatched in dim
    (105L, 20L, 16.0))                 // fan-out key
    .toDF("id", "k", "v")

  // 100 value-updated; 101 moved 1→3; 102 deleted; 103 moved to
  // UNMATCHED k=40 (acts as delete); 104 moved from unmatched onto
  // matched k=2 (acts as insert); 105 (fan-out) deleted — BOTH its view
  // rows must retract; 106 inserted; 107 inserted at unmatched k=50
  private def afterA: DataFrame = Seq(
    (100L, 1L, 2.0), (101L, 3L, 2.5),
    (103L, 40L, 8.0), (104L, 2L, 99.0),
    (106L, 2L, 32.0), (107L, 50L, 64.0))
    .toDF("id", "k", "v")

  private def fold(state: DataFrame, feed: DataFrame, keys: Seq[String]): DataFrame =
    Incremental.applyJoinFeedPartials(state, feed, dim, Seq("k"), Seq("id"), keys, "v")

  private def rowsOf(p: DataFrame, keys: Seq[String]) =
    p.select(keys.map(col) :+ col("cnt") :+ col("sum_v").cast("double"): _*)
      .orderBy(keys.map(col): _*).collect().toSeq

  test("feed-folded partials equal the after-snapshot recompute, exactly") {
    val state = Incremental.retractablePartials(
      beforeA.join(dim, Seq("k")), Seq("g"), "v")
    val feed = Cdc.snapshotDiffFull(beforeA, afterA, Seq("id"))
    val folded = fold(state, feed, Seq("g"))
    val recompute = Incremental.retractablePartials(
      afterA.join(dim, Seq("k")), Seq("g"), "v")
    assert(rowsOf(folded, Seq("g")) === rowsOf(recompute, Seq("g")))
  }

  test("A-side group keys (the join key itself) fold correctly too") {
    val state = Incremental.retractablePartials(
      beforeA.join(dim, Seq("k")), Seq("k"), "v")
    val feed = Cdc.snapshotDiffFull(beforeA, afterA, Seq("id"))
    val folded = fold(state, feed, Seq("k"))
    val recompute = Incremental.retractablePartials(
      afterA.join(dim, Seq("k")), Seq("k"), "v")
    assert(rowsOf(folded, Seq("k")) === rowsOf(recompute, Seq("k")))
  }

  test("a sliced feed folds batch-by-batch to the same state (the streaming shape)") {
    // feed rows are independent per rowId, so ANY slicing of the feed
    // folds to the same final state — what lets e122 deliver the feed
    // as micro-batches
    val state0 = Incremental.retractablePartials(
      beforeA.join(dim, Seq("k")), Seq("g"), "v")
    val feed = Cdc.snapshotDiffFull(beforeA, afterA, Seq("id"))
    val slice0 = feed.filter(pmod(col("id"), lit(2)) === 0)
    val slice1 = feed.filter(pmod(col("id"), lit(2)) === 1)
    val streamed = fold(fold(state0, slice0, Seq("g")), slice1, Seq("g"))
    val oneShot = fold(state0, feed, Seq("g"))
    assert(rowsOf(streamed, Seq("g")) === rowsOf(oneShot, Seq("g")))
  }

  test("batch-id-versioned state: replay from the same version is idempotent; " +
      "an UNVERSIONED double-apply would corrupt") {
    val v0 = Incremental.retractablePartials(
      beforeA.join(dim, Seq("k")), Seq("g"), "v").localCheckpoint()
    val feed = Cdc.snapshotDiffFull(beforeA, afterA, Seq("id")).localCheckpoint()
    // the e122 protocol: batch id → state version; a crash-recovery
    // re-delivery of batch 0 re-reads v0 and overwrites v1 with the
    // IDENTICAL result — it cannot double-count
    val v1 = rowsOf(fold(v0, feed, Seq("g")), Seq("g"))
    val v1replay = rowsOf(fold(v0, feed, Seq("g")), Seq("g"))
    assert(v1 === v1replay)
    // what versioning prevents: folding the same feed onto the ALREADY
    // UPDATED state diverges — the protocol, not the operator, is what
    // makes replay safe
    val doubled = rowsOf(
      fold(fold(v0, feed, Seq("g")), feed, Seq("g")), Seq("g"))
    assert(doubled !== v1)
  }

  test("bootstrapJoinPartials ≡ retractablePartials over the materialized view, exactly") {
    // the v0 recipe (VERDICT r19 #4): pre-aggregate → join → re-aggregate
    // must land bit-identical to partials over the materialized view,
    // across fan-out keys (20), unmatched A keys (4), and group keys
    // from EITHER side
    for (keys <- Seq(Seq("g"), Seq("k"), Seq("g", "k"))) {
      val direct = Incremental.bootstrapJoinPartials(
        beforeA, dim, Seq("k"), keys, "v")
      val viaView = Incremental.retractablePartials(
        beforeA.join(dim, Seq("k")), keys, "v")
      assert(rowsOf(direct, keys) === rowsOf(viaView, keys), s"keys=$keys")
    }
  }

  test("bootstrapJoinPartials seeds applyJoinFeedPartials maintenance (the e122 lifecycle)") {
    val v0 = Incremental.bootstrapJoinPartials(beforeA, dim, Seq("k"), Seq("g"), "v")
    val feed = Cdc.snapshotDiffFull(beforeA, afterA, Seq("id"))
    val maintained = fold(v0, feed, Seq("g"))
    val recompute = Incremental.retractablePartials(
      afterA.join(dim, Seq("k")), Seq("g"), "v")
    assert(rowsOf(maintained, Seq("g")) === rowsOf(recompute, Seq("g")))
  }

  test("bootstrapJoinPartials rejects a B-side valueCol loudly") {
    val e = intercept[IllegalArgumentException] {
      Incremental.bootstrapJoinPartials(beforeA, dim, Seq("k"), Seq("g"), "g")
    }
    assert(e.getMessage.contains("A-side column"))
  }

  test("a keys-only diff (no before-image twins) is rejected loudly") {
    val state = Incremental.retractablePartials(
      beforeA.join(dim, Seq("k")), Seq("g"), "v")
    val keysOnly = Cdc.snapshotDiffFull(beforeA, afterA, Seq("id"))
      .drop("k_before", "v_before")
    val e = intercept[IllegalArgumentException] {
      fold(state, keysOnly, Seq("g"))
    }
    assert(e.getMessage.contains("before-image twin"))
  }

  test("unknown op codes fail at exec time instead of double-counting") {
    val state = Incremental.retractablePartials(
      beforeA.join(dim, Seq("k")), Seq("g"), "v")
    val bad = Seq(("c", 100L, 1L, 2.0, 1L, 1.5))
      .toDF("op", "id", "k", "v", "k_before", "v_before")
    val e = intercept[Exception] { fold(state, bad, Seq("g")).collect() }
    assert(e.getMessage.contains("unknown op code"))
  }
}
