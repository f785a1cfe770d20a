package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** [[GapSessions]] (c56): the v2 transformWithState TIMER surface —
  * event-time timers close idle sessions when the watermark passes, and
  * the emitted set is independent of micro-batch slicing and in-batch
  * arrival order (the determinism contract the DuckDB oracle relies
  * on). MemoryStream lets the spec control batch boundaries exactly —
  * the thing the file-sourced declared query cannot vary. */
class GapSessionsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))
  private val gapUs = 1800L * 1000000L // 30 min

  private def runStream(
      batches: Seq[Seq[(Timestamp, Long)]]): Set[(Long, Long, Long, Long)] = {
    val s = StateBackend.isolatedStreamSession(spark, shufflePartitions = 2)
    import s.implicits._
    implicit val sctx = s.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val ev = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[GapSessions.SessionEvent]
    val name = s"gap_sessions_${System.nanoTime()}"
    val q = GapSessions.sessions(s, ev, gapUs).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // one more empty pass: the watermark computed from the last data
      // batch only takes effect on the NEXT batch, which is also the
      // one that fires the now-expired timers
      q.processAllAvailable()
      s.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    } finally { q.stop() }
  }

  test("timers close idle sessions; slicing and arrival order don't change the set") {
    // u1: two sessions — the first closed IN-BATCH by the 11:30 event
    //     (80 min gap), the second by TIMER (watermark 13:00 > 12:00);
    // u2: one single-event session, closed by TIMER only — no later u2
    //     event exists;
    // u3: the watermark pusher — its events are 30 min apart (== gap,
    //     NOT >), so they are ONE session, which stays open (watermark
    //     never passes its expiry) and must NOT be emitted.
    val events = Seq(
      (ts("2024-01-01T10:00:00Z"), 1L), (ts("2024-01-01T10:10:00Z"), 1L),
      (ts("2024-01-01T10:05:00Z"), 2L),
      (ts("2024-01-01T11:30:00Z"), 1L),
      (ts("2024-01-01T13:00:00Z"), 3L), (ts("2024-01-01T13:30:00Z"), 3L))
    val expected = Set(
      (1L, 1L, 2L, 600L * 1000000L), // u1 session 1: 10:00-10:10
      (1L, 2L, 1L, 0L),              // u1 session 2: 11:30, timer-closed
      (2L, 1L, 1L, 0L))              // u2: timer-closed
    val oneBatch = runStream(Seq(events))
    assert(oneBatch == expected, s"single batch: $oneBatch")
    // different micro-batch slicing → same set
    val sliced = runStream(Seq(events.take(3), events.slice(3, 4), events.drop(4)))
    assert(sliced == expected, s"sliced: $sliced")
    // reversed arrival order INSIDE one batch → same set (the processor
    // sorts each batch's rows by event time before folding)
    val reversed = runStream(Seq(events.reverse))
    assert(reversed == expected, s"reversed: $reversed")
  }
}
