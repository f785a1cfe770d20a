package graft.streaming

import graft.{Q, Qh, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Declared conformance query for the streaming track: the SAME daily
  * cost-trend aggregation the batch suite declares (the D3 shape), but
  * computed by Structured Streaming end-to-end — file-source
  * `readStream` over the events parquet, a tumbling 1-day event-time
  * window, `Trigger.AvailableNow` drain into a memory sink — and
  * hash-checked against the DuckDB BATCH oracle. Streaming semantics
  * stop being suite-only claims: if the incremental computation drifted
  * from batch semantics by a row or a rounding, the hash would say so.
  *
  * Determinism: complete output mode emits every window after the drain
  * (no watermark race on the last window); the decimal pre-sum makes the
  * totals independent of micro-batch boundaries and partitioning. Each
  * invocation uses a fresh implicit temporary checkpoint, so reruns
  * reprocess the full input instead of resuming an old offset log.
  *
  * Scale posture: this is the cron-replacement geometry
  * ([[StreamingSync]]) — per micro-batch work is bounded by
  * `maxFilesPerTrigger`-style admission, state is one row per open
  * window, and the memory sink here stands in for the loader's
  * foreachBatch append (used by [[StreamingSync.incrementalSync]]).
  */
object StreamQueries {
  import Qh._

  /** The events file-stream source, `ts` normalized to a zoned
    * `TimestampType` whatever the parquet physical flavor
    * ([[Tables.normalizeEventTs]] — the same normalizer the batch loader
    * uses, so stream and batch semantics cannot drift). The schema is
    * pinned from a batch probe (file streams require one); the source
    * path is a glob matching exactly the one file, because a file stream
    * rejects a plain FILE path as its basePath — the glob makes it derive
    * basePath from the parent directory instead. */
  private[graft] def eventStream(s: SparkSession, d: String): DataFrame = {
    val batchSchema = s.read.parquet(s"$d/events.parquet").schema
    Tables.normalizeEventTs(
      s.readStream.schema(batchSchema).parquet(s"$d/events.parque[t]"))
  }

  val c40 = Q(
    "c40_stream_window",
    (outer, d) => {
      // isolated session sized for streaming state (see c51), on the
      // RocksDB backend ([[StateBackend]]): windowed aggregation keeps
      // one store per shuffle partition
      val s = StateBackend.isolatedStreamSession(outer)
      val ev = eventStream(s, d)
      val agg = ev
        .groupBy(window(col("ts"), "1 day"))
        .agg(dsum(col("value")).as("total"), count(lit(1)).as("n"))
        .select(to_date(col("window.start")).as("day"), col("total"), col("n"))
      val q = agg.writeStream
        .format("memory").queryName("graft_c40_stream")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_c40_stream").orderBy(col("day"))
    },
    Some(s"""SELECT CAST(ts AS DATE) AS day, ${oSum("value")} AS total, COUNT(*) AS n
      FROM events GROUP BY day ORDER BY day"""))

  // C47: streaming DEDUP conformance — `dropDuplicatesWithinWatermark`
  // promoted from suite-only behavior tests to a hash-checked query. The
  // stream is the events source UNIONED WITH ITSELF (every event arrives
  // twice, the at-least-once delivery shape a dedup stage exists for);
  // dedup on event_id must collapse it back to exactly the batch
  // per-day counts. The oracle is the PLAIN batch aggregation, so a
  // single leaked duplicate or dropped event breaks the hash.
  val c47 = Q(
    "c47_stream_dedup",
    (outer, d) => {
      // isolated session sized for streaming state (see c51), RocksDB
      // backend: dedup + window stores per shuffle partition
      val s = StateBackend.isolatedStreamSession(outer)
      def src = eventStream(s, d)
      val doubled = src.union(src)
      val deduped = doubled
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark("event_id")
      val agg = deduped
        .groupBy(window(col("ts"), "1 day"))
        .agg(dsum(col("value")).as("total"), count(lit(1)).as("n"))
        .select(to_date(col("window.start")).as("day"), col("total"), col("n"))
      val q = agg.writeStream
        .format("memory").queryName("graft_c47_stream")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_c47_stream").orderBy(col("day"))
    },
    Some(s"""SELECT CAST(ts AS DATE) AS day, ${oSum("value")} AS total, COUNT(*) AS n
      FROM events GROUP BY day ORDER BY day"""))

  // C50: the stateful-processing capability (`flatMapGroupsWithState`,
  // [[CostState.budgetAlerts]]) promoted from suite-only behavior tests
  // to a hash-checked query: drain the events file stream through the
  // per-account budget latch and compare the SET of tripped accounts to
  // the batch restatement (accounts whose total cost reaches the
  // budget). The alert's emission-time running total depends on
  // micro-batch boundaries, so the declared output is the deterministic
  // part — (account_id, budget) — while "exactly one alert per crossing
  // account, none below" is precisely the latch semantics under test.
  // Budget sits 0.005 off any representable per-account sum (nearest
  // real sum is >0.5 away at every SF), so double summation order can't
  // flip a membership.
  val c50 = Q(
    "c50_stream_stateful",
    (outer, d) => {
      // isolated session sized for streaming state (see c51), RocksDB
      // backend for the flatMapGroupsWithState user state
      val s = StateBackend.isolatedStreamSession(outer)
      import s.implicits._
      val ev = eventStream(s, d)
        .select(col("user_id").cast("string").as("account_id"),
          col("value").as("cost"))
        .as[CostState.CostEvent]
      val alerts = CostState.budgetAlerts(s, ev, budget = 3300.005)
      val q = alerts.toDF()
        .select(col("account_id"), col("budget"))
        .writeStream
        .format("memory").queryName("graft_c50_stream")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_c50_stream").orderBy(col("account_id"))
    },
    Some("""SELECT CAST(user_id AS VARCHAR) AS account_id, 3300.005 AS budget
      FROM events GROUP BY account_id HAVING SUM(value) >= 3300.005
      ORDER BY account_id"""))

  // C51: STREAM-STREAM inner join — the last headline Structured
  // Streaming operator next to windows (c40), watermark dedup (c47) and
  // arbitrary state (c50). Two event streams (purchases, clicks) join
  // per user under an event-time range (click within the hour before
  // the purchase) with watermarks on BOTH sides — the bounded-state
  // production shape: each side's state retires once the other's
  // watermark passes the range. Drained with AvailableNow and
  // hash-checked against the batch join restated in epoch-micros
  // arithmetic (the session reads nanos as micros; stating the range
  // in micros keeps both engines on identical integer compares). */
  val c51 = Q(
    "c51_stream_stream_join",
    (outer, d) => {
      // stream-stream join keeps TWO state stores per shuffle partition;
      // at the batch suite's 32 partitions that is 64 store lifecycles
      // per micro-batch for a bounded drain. An isolated session (shared
      // SparkContext, own SQLConf) sizes the streaming state at 8
      // partitions without touching the caller's conf, and puts the join
      // buffers on RocksDB ([[StateBackend]]) — the two-sided join state
      // is exactly the store that outgrows heap first at 100 TB. Output
      // content is partitioning-independent.
      val s = StateBackend.isolatedStreamSession(outer)
      def src = eventStream(s, d)
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"), col("value").as("p_value"))
        .withWatermark("p_ts", "1 day")
      val clicks = src.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 day")
      val joined = purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
        .select(col("p_id"), col("c_id"), col("user_id"), col("p_value"))
      val q = joined.writeStream
        .format("memory").queryName("graft_c51_stream")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_c51_stream").orderBy(col("p_id"), col("c_id"))
    },
    Some("""SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id,
        p.value AS p_value
      FROM events p JOIN events c
        ON p.event_type = 'purchase' AND c.event_type = 'click'
        AND c.user_id = p.user_id
        AND epoch_ns(c.ts) // 1000
          BETWEEN epoch_ns(p.ts) // 1000 - 3600000000 AND epoch_ns(p.ts) // 1000
      ORDER BY p_id, c_id"""))

  // C55: arbitrary keyed state on the v2 `transformWithState` API
  // ([[TypeCompletion]]) — the successor of c50's
  // flatMapGroupsWithState, exercising the v2-only typed primitives
  // (MapState per-type counts + ValueState latch, per-entry RocksDB
  // rows instead of one opaque blob per key). Emits each user exactly
  // once when their distinct-event-type count reaches 5; the emitted
  // SET is order- and batching-independent, so the batch oracle
  // restates it as COUNT(DISTINCT event_type) >= 5.
  val c55 = Q(
    "c55_stream_transform_state",
    (outer, d) => {
      // isolated session sized for streaming state (see c51), RocksDB
      // backend — transformWithState requires the RocksDB provider
      val s = StateBackend.isolatedStreamSession(outer)
      import s.implicits._
      val ev = eventStream(s, d)
        .select(col("user_id"), col("event_type"))
        .as[TypeCompletion.TypedEvent]
      val out = TypeCompletion.completions(s, ev, need = 5)
      val q = out.toDF()
        .writeStream
        .format("memory").queryName("graft_c55_stream")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_c55_stream").orderBy(col("account_id"))
    },
    Some("""SELECT CAST(user_id AS BIGINT) AS account_id, 5 AS n_types
      FROM events GROUP BY user_id HAVING COUNT(DISTINCT event_type) >= 5
      ORDER BY account_id"""))

  // C56: the TIMER half of the v2 transformWithState surface
  // ([[GapSessions]]) — event-time timers + watermark closing gap
  // sessions, the streaming restatement of the batch sessionize (c43).
  // Sessions close in-batch (a later same-user event beyond the gap) or
  // by timer (the final watermark — global max event time at 0s delay —
  // passes the session's ms-registered expiry); only each user's last
  // session can stay open. The oracle is c43's session frame with
  // exactly that closed-session filter, so the timer firing set itself
  // is hash-checked, not just the session arithmetic.
  val c56 = Q(
    "c56_stream_session_timers",
    (outer, d) => {
      val s = StateBackend.isolatedStreamSession(outer)
      import s.implicits._
      val gapUs = 1800L * 1000000L // 30 min, c43's gap
      val ev = eventStream(s, d)
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .as[GapSessions.SessionEvent]
      val out = GapSessions.sessions(s, ev, gapUs)
      val q = out.toDF().writeStream
        .format("memory").queryName("graft_c56_stream")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.MicroBatchPlans.record("c56_stream_session_timers", q)
      s.table("graft_c56_stream").orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
      m AS (SELECT user_id, us,
          CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w > 1800000000
            THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      s AS (SELECT user_id, us,
          CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM m),
      g AS (SELECT user_id, session_id, COUNT(*) AS n_events,
          MAX(us) - MIN(us) AS duration_us, MAX(us) AS last_us
        FROM s GROUP BY user_id, session_id),
      mx AS (SELECT MAX(us) AS max_us FROM e)
      SELECT user_id, session_id, n_events, duration_us
      FROM g, mx
      WHERE session_id < (SELECT MAX(session_id) FROM g g2
          WHERE g2.user_id = g.user_id)
        OR (last_us + 1800000000 + 999) // 1000 < max_us // 1000
      ORDER BY user_id, session_id"""))

  // C57: STREAMING CDC APPLY — the versioned out-of-order-safe merge
  // ([[graft.etl.Cdc.applyChangesVersioned]]) driven from a file stream:
  // the warehouse snapshot is seeded from the first half of the month,
  // the second half arrives as three micro-batches sliced by
  // event_id % 3 — deliberately NOT time-ordered, so per-user changes
  // interleave across batches and only the version compare (not batch
  // order) can produce the right answer. Each batch merges into a
  // versioned parquet state keyed BY BATCH ID (replay overwrites the
  // same version — idempotent, the e49 discipline). The oracle is the
  // global latest-wins restatement over the whole month with
  // second-half 'error' as the delete op: the hash proves the
  // stream-of-batches converges to exactly the one-shot batch answer,
  // tombstone semantics included.
  val c57 = Q(
    "c57_stream_cdc_apply",
    (outer, d) => {
      import graft.etl.Cdc
      val s = StateBackend.isolatedStreamSession(outer)
      val cut = lit("2024-01-16").cast("timestamp")
      val keys = Seq("user_id")
      val ord = Seq("last_ts", "event_id")
      def asChange(df: DataFrame, deletes: Boolean): DataFrame = {
        val base = df.select(
          col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"), col("ts").as("last_ts"), col("event_id"))
        if (deletes)
          base.withColumn("op",
            when(col("last_type") === "error", "D").otherwise("U"))
        else base.withColumn("op", lit("U"))
      }
      val ev = Tables.events(s, d)
      // v0: the snapshot bootstrap is itself a versioned apply onto an
      // empty state (dogfoods the operator's empty-state path)
      val stateRoot = graft.ext.ExtQueries.tempQueryDir("graft_c57_state")
      val h1 = asChange(ev.filter(col("ts") < cut), deletes = false)
      Cdc.applyChangesVersioned(h1.limit(0), h1, keys, ord)
        .write.mode("overwrite").parquet(s"$stateRoot/v0")
      // stage the changelog as three deterministic micro-batches (the
      // e54 discipline: one file per slice, mtimes pinned ascending so
      // the oldest-first file source admits them one per trigger)
      val staging = graft.ext.ExtQueries.tempQueryDir("graft_c57_in")
      val fs = new org.apache.hadoop.fs.Path(staging)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      for (g <- 0 to 2) {
        val p = s"$staging/slice$g"
        asChange(ev.filter(col("ts") >= cut), deletes = true)
          .filter(pmod(col("event_id"), lit(3)) === g)
          .coalesce(1).write.mode("overwrite").parquet(p)
        fs.listStatus(new org.apache.hadoop.fs.Path(p))
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
          .foreach(st => fs.setTimes(st.getPath, 1700000000000L + g * 60000L, -1))
      }
      val sch = s.read.parquet(s"$staging/slice0").schema
      val src = s.readStream.schema(sch).option("maxFilesPerTrigger", 1)
        .parquet(s"$staging/slice*")
      val ckpt = graft.ext.ExtQueries.tempQueryDir("graft_c57_ck")
      val q = src.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          Cdc.applyChangesVersioned(
            batch.sparkSession.read.parquet(s"$stateRoot/v$id"),
            batch, keys, ord)
            .write.mode("overwrite").parquet(s"$stateRoot/v${id + 1}")
        }
        .start()
      q.awaitTermination()
      val vmax = fs.listStatus(new org.apache.hadoop.fs.Path(stateRoot))
        .map(_.getPath.getName).filter(_.startsWith("v")).map(_.drop(1).toInt).max
      Cdc.liveView(s.read.parquet(s"$stateRoot/v$vmax"), ord)
        .select(col("user_id"), col("last_type"), col("last_value"), col("last_ts"))
        .orderBy(col("user_id"))
    },
    Some("""WITH L AS (SELECT user_id, event_type AS last_type, value AS last_value,
          ts AS last_ts,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, last_type, last_value, last_ts FROM L
      WHERE rn = 1
        AND NOT (last_type = 'error' AND last_ts >= TIMESTAMP '2024-01-16')
      ORDER BY user_id"""))

  // C60: STREAM–STATIC JOIN — the dimension-enrichment shape every
  // streaming ingest runs (enrich each event with its customer's nation
  // before aggregating), and the one join family the streaming track
  // didn't yet declare (c51 is stream–stream). The static side is a
  // plain batch frame re-planned per micro-batch; Spark broadcasts it
  // under the usual size rules, so the stream side never shuffles for
  // the join — exactly the posture a 100 TB stream needs (dims
  // broadcast; only the post-join aggregation exchanges, and that
  // after map-side partial aggregation). The dim chain
  // (customer→nation) is joined batch-side first — one tiny
  // broadcast instead of two.
  //
  // The oracle is the BATCH restatement of the same join+aggregate, so
  // the hash proves the per-micro-batch join accumulates to exactly
  // the batch semantics (complete output mode drains every group).
  val c60 = Q(
    "c60_stream_static_join",
    (outer, d) => {
      val s = StateBackend.isolatedStreamSession(outer)
      val dim = Tables.customer(s, d)
        .join(Tables.nation(s, d),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_mktsegment"), col("n_name"))
      val joined = eventStream(s, d)
        .join(dim, col("user_id") === col("c_custkey"))
      val agg = joined
        .groupBy(col("n_name"), col("c_mktsegment"))
        .agg(dsum(col("value")).as("total"), count(lit(1)).as("n"))
      val q = agg.writeStream
        .format("memory").queryName("graft_c60_stream")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_c60_stream").orderBy(col("n_name"), col("c_mktsegment"))
    },
    Some(s"""SELECT n_name, c_mktsegment, ${oSum("value")} AS total, COUNT(*) AS n
      FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n_name, c_mktsegment ORDER BY n_name, c_mktsegment"""))

  val all: Seq[Q] = Seq(c40, c47, c50, c51, c55, c56, c57, c60)
}
