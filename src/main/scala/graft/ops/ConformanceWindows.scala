package graft.ops

import graft.{Q, Qh, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conformance queries C18–C21 (SURVEY.md §2.3): window functions.
  *
  * Every window partitions by a key (customer / user / event type) so the
  * shuffle is a single hash exchange on that key — no global sort, no
  * driver materialization; at 100 TB the per-key groups stay bounded.
  * Ranking/ordering inside each window carries a unique tie-break key so
  * results are total-ordered and engine-independent.
  */
object ConformanceWindows {
  import Qh._

  // C18: ranking trio, top-3 per customer.
  val c18 = Q(
    "c18_window_rank",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast(LongType).as("rn"),
          rank().over(w).cast(LongType).as("rk"),
          dense_rank().over(w).cast(LongType).as("drk"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ) WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  // C19: LAG/LEAD offsets per user.
  val c19 = Q(
    "c19_window_lag_lead",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          lag(col("value"), 1).over(w).as("prev_v"),
          lead(col("value"), 1).over(w).as("next_v"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""SELECT event_id, user_id, ts, value,
        LAG(value) OVER w AS prev_v, LEAD(value) OVER w AS next_v
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, ts, event_id"""))

  // C20: running sum + 7-row moving average; decimal-cast per float rule,
  // moving avg as exact-sum ÷ window count so both engines divide the
  // same doubles.
  val c20 = Q(
    "c20_window_frames",
    (s, d) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w7 = wOrd.rowsBetween(-6, Window.currentRow)
      T.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          sum(col("value").cast(Dec)).over(wRun).cast(DoubleType).as("run_sum"),
          (sum(col("value").cast(Dec)).over(w7).cast(DoubleType) /
            count(col("value")).over(w7)).as("mov_avg"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""SELECT event_id, user_id, ts,
        CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER wr AS DOUBLE) AS run_sum,
        CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w7 AS DOUBLE) / COUNT(value) OVER w7 AS mov_avg
      FROM events
      WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING),
             w7 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts, event_id"""))

  // C21: share-of-total over an unbounded partition frame.
  val c21 = Q(
    "c21_window_share",
    (s, d) => {
      val w = Window.partitionBy(col("event_type"))
      T.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          (col("value") / sum(col("value").cast(Dec)).over(w).cast(DoubleType)).as("share"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, event_type, value,
        value / CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY event_type) AS DOUBLE) AS share
      FROM events ORDER BY event_id"""))

  // C43: gap-based sessionization — the canonical behavioral transform
  // over an event stream (and the batch mirror of the streaming session
  // windows in streaming/StreamingSync): a new session starts when a
  // user's inter-event gap exceeds 30 minutes; per session, event count
  // and exact duration.
  //
  // Scale shape: ONE hash exchange on user_id serves both windows (lag
  // and the running sum share the same partitioning+ordering), then the
  // per-session aggregation reduces map-side before its exchange. No
  // global sort, no driver state — per-user groups are bounded. Times
  // are compared as epoch MICROSECONDS (longs): Spark's events loader
  // truncates the parquet nanos with `div 1000`, the oracle mirrors with
  // `epoch_ns // 1000`, so boundaries and durations are exact integers
  // on both engines. Tied timestamps cannot flip session ids (a zero gap
  // never opens a session), so the cumulative sum is order-stable.
  val c43 = Q(
    "c43_sessionize",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = 1800L * 1000000L // 30 min
      T.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .withColumn("new_sess",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("us")) - min(col("us"))).as("duration_us"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
      m AS (SELECT user_id, us,
          CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w > 1800000000
            THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      s AS (SELECT user_id, us,
          CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM m)
      SELECT user_id, session_id, COUNT(*) AS n_events,
        MAX(us) - MIN(us) AS duration_us
      FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"""))

  // C59: the DISTRIBUTION window trio — ntile / percent_rank /
  // cume_dist — the remaining ANSI window family (c18 covers the
  // ranking trio). Determinism across engines: the window order is
  // TOTAL (price, then unique order key), which ntile requires — it
  // buckets by row position, so a tie-broken order is the only
  // engine-independent spelling; percent_rank = (rank−1)/(n−1) and
  // cume_dist = peers≤current / n are integer-operand IEEE divisions,
  // bit-equal on both engines. Same scale shape as c18: one hash
  // exchange on the partition key, per-key sort bounded by the key's
  // group size.
  val c59 = Q(
    "c59_window_distribution",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      T.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        NTILE(4) OVER w AS quartile,
        PERCENT_RANK() OVER w AS pct_rank,
        CUME_DIST() OVER w AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_custkey, o_totalprice, o_orderkey"""))

  val all: Seq[Q] = Seq(c18, c19, c20, c21, c43, c59)
}
