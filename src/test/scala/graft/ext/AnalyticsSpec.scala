package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(xs: (Long, String, String, Double)*): DataFrame =
    xs.toDF("user_id", "tss", "event_type", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")

  // ---------------- funnel ----------------

  test("funnel: steps must occur strictly in order") {
    val events = ev(
      // u1 completes all three in order
      (1L, "2024-01-01 10:00:00", "signup", 1.0),
      (1L, "2024-01-02 10:00:00", "click", 1.0),
      (1L, "2024-01-03 10:00:00", "purchase", 1.0),
      // u2 clicked BEFORE signing up — click must not count
      (2L, "2024-01-01 10:00:00", "click", 1.0),
      (2L, "2024-01-02 10:00:00", "signup", 1.0),
      // u3 never signed up — absent from the output entirely
      (3L, "2024-01-01 10:00:00", "click", 1.0),
      (3L, "2024-01-02 10:00:00", "purchase", 1.0))
    val out = Analytics.funnel(events, Seq("signup", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "steps_completed").as[(Long, Int)].collect().toSeq
    assert(out === Seq((1L, 3), (2L, 1)))
  }

  test("funnel: a same-timestamp next step does not advance (strictly after)") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "signup", 1.0),
      (1L, "2024-01-01 10:00:00", "click", 1.0), // same instant: no
      (2L, "2024-01-01 10:00:00", "signup", 1.0),
      (2L, "2024-01-01 10:00:01", "click", 1.0)) // one second later: yes
    val out = Analytics.funnel(events, Seq("signup", "click"))
      .orderBy("user_id")
      .select("user_id", "steps_completed").as[(Long, Int)].collect().toSeq
    assert(out === Seq((1L, 1), (2L, 2)))
  }

  test("funnel: earliest qualifying time is kept per step") {
    val events = ev(
      (1L, "2024-01-05 00:00:00", "signup", 1.0),
      (1L, "2024-01-01 00:00:00", "signup", 1.0), // earlier signup wins
      (1L, "2024-01-03 00:00:00", "click", 1.0),  // after 01-01 → counts
      (1L, "2024-01-06 00:00:00", "click", 1.0))
    val out = Analytics.funnel(events, Seq("signup", "click"))
      .select(col("step1_ts").cast("string"), col("step2_ts").cast("string"))
      .as[(String, String)].head()
    assert(out === (("2024-01-01 00:00:00", "2024-01-03 00:00:00")))
  }

  // ---------------- forwardFill ----------------

  test("forwardFill: carry-last semantics on a gapped key") {
    val events = ev(
      (1L, "2024-01-01 05:00:00", "a", 10.0),
      (1L, "2024-01-01 07:00:00", "a", 5.0),  // same day: summed → 15
      (1L, "2024-01-04 05:00:00", "a", 7.0),  // 3-day gap before this
      (1L, "2024-01-02 05:00:00", "b", 1.0))  // key b: single day
    val out = Analytics.forwardFill(events, keyCol = "event_type")
      .orderBy("event_type", "day")
      .select(col("event_type"), col("day").cast("string"), col("observed"),
        col("filled_cost"))
      .as[(String, String, Int, Double)].collect().toSeq
    assert(out === Seq(
      ("a", "2024-01-01", 1, 15.0),
      ("a", "2024-01-02", 0, 15.0),
      ("a", "2024-01-03", 0, 15.0),
      ("a", "2024-01-04", 1, 7.0),
      ("b", "2024-01-02", 1, 1.0)))
  }

  // ---------------- dailySpikes ----------------

  test("dailySpikes: ratio is daily/mean and the threshold filters") {
    // key a: days of 10, 20, 60 → mean 30 → ratios 1/3, 2/3, 2.0
    val events = ev(
      (1L, "2024-01-01 01:00:00", "a", 10.0),
      (1L, "2024-01-02 01:00:00", "a", 20.0),
      (1L, "2024-01-03 01:00:00", "a", 60.0))
    val out = Analytics.dailySpikes(events, threshold = 1.5)
      .select(col("day").cast("string"), col("daily_cost"), col("ratio"))
      .as[(String, Double, Double)].collect().toSeq
    assert(out === Seq(("2024-01-03", 60.0, 2.0)))
  }

  test("dailySpikes: keys are scored against their OWN mean only") {
    val events = ev(
      (1L, "2024-01-01 01:00:00", "small", 1.0),
      (1L, "2024-01-02 01:00:00", "small", 3.0),  // ratio 1.5 on key small
      (1L, "2024-01-01 01:00:00", "big", 1000.0),
      (1L, "2024-01-02 01:00:00", "big", 1000.0)) // flat: no spike
    val out = Analytics.dailySpikes(events, threshold = 1.2)
      .select("event_type").as[String].collect().toSeq
    assert(out === Seq("small"))
  }

  // ---------------- cohortRetention ----------------

  test("cohortRetention: first-seen week buckets and offset counts") {
    val events = ev(
      // u1 first seen week of Jan 1 (Mon), active again week of Jan 8
      (1L, "2024-01-02 01:00:00", "x", 1.0),
      (1L, "2024-01-10 01:00:00", "x", 1.0),
      // u2 first seen week of Jan 1 only
      (2L, "2024-01-03 01:00:00", "x", 1.0),
      // u3 first seen week of Jan 8
      (3L, "2024-01-09 01:00:00", "x", 1.0))
    val out = Analytics.cohortRetention(events)
      .orderBy("cohort_week", "week_offset")
      .select(col("cohort_week").cast("string"), col("week_offset"), col("users"))
      .as[(String, Int, Long)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01", 0, 2L),
      ("2024-01-01", 1, 1L),
      ("2024-01-08", 0, 1L)))
  }

  test("cohortRetention: multiple events in one week count the user once") {
    val events = ev(
      (1L, "2024-01-02 01:00:00", "x", 1.0),
      (1L, "2024-01-03 01:00:00", "x", 1.0),
      (1L, "2024-01-04 01:00:00", "x", 1.0))
    val out = Analytics.cohortRetention(events)
      .select("users").as[Long].collect().toSeq
    assert(out === Seq(1L))
  }

  // ---------------- rollingAnomalies ----------------

  private def dayEv(xs: (String, Double)*): DataFrame =
    xs.toDF("day", "value")
      .select(lit("t").as("event_type"),
        concat(col("day"), lit(" 12:00:00")).cast("timestamp").as("ts"),
        col("value"))

  test("rollingAnomalies: a step change is flagged, flat history is not") {
    // 8 flat days then a 10× spike — only the spike day trips
    val events = dayEv(
      (1 to 8).map(i => (f"2024-01-$i%02d", 10.0)) :+ ("2024-01-09", 100.0): _*)
    val out = Analytics.rollingAnomalies(events)
      .select(col("day").cast("string"), col("z")).as[(String, Double)]
      .collect().toSeq
    assert(out.map(_._1) === Seq("2024-01-09"))
    assert(out.head._2 > 1.5)
  }

  test("rollingAnomalies: the trailing window forgets a spike 8+ days old") {
    // spike on day 1, flat after: day 1 itself is suppressed (n < minDays)
    // and by day 9 the spike has left the 7-day frame entirely
    val events = dayEv(
      ("2024-01-01", 100.0) +: (2 to 9).map(i => (f"2024-01-$i%02d", 10.0)): _*)
    assert(Analytics.rollingAnomalies(events).count() === 0L)
  }

  test("rollingAnomalies: windows shorter than minDays are suppressed") {
    val events = dayEv(("2024-01-01", 10.0), ("2024-01-02", 500.0), ("2024-01-03", 10.0))
    assert(Analytics.rollingAnomalies(events).count() === 0L)
  }

  // ---------------- histogram ----------------

  test("histogram: equi-width bins, max folds into the last bin") {
    val df = (0 to 10).map(_.toDouble).toDF("v")
    val out = Analytics.histogram(df, "v", nBins = 5)
      .orderBy("bin")
      .select(col("bin"), col("n"), col("total")).as[(Long, Long, Double)]
      .collect().toSeq
    // width 2: [0,2) [2,4) [4,6) [6,8) [8,10]; v=10 folds into bin 4
    assert(out === Seq(
      (0L, 2L, 1.0), (1L, 2L, 5.0), (2L, 2L, 9.0), (3L, 2L, 13.0), (4L, 3L, 27.0)))
  }

  test("histogram: a single-value domain lands everything in bin 0") {
    val df = Seq(7.0, 7.0, 7.0).toDF("v")
    val out = Analytics.histogram(df, "v", nBins = 4)
      .select(col("bin"), col("n")).as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 3L)))
  }

  // ---------------- attribution ----------------

  private def idEv(xs: (Long, Long, String, String, Double)*): DataFrame =
    xs.toDF("event_id", "user_id", "tss", "event_type", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")

  test("attribution: first and last preceding touches; organic stays NULL") {
    val events = idEv(
      (1L, 1L, "2024-01-01 10:00:00", "view", 0.0),
      (2L, 1L, "2024-01-02 10:00:00", "click", 0.0),
      (3L, 1L, "2024-01-03 10:00:00", "purchase", 50.0),
      (4L, 1L, "2024-01-04 10:00:00", "view", 0.0), // AFTER: must not credit
      (5L, 2L, "2024-01-01 10:00:00", "purchase", 9.0)) // organic
    val out = Analytics.attribution(events, Seq("click", "view"), "purchase")
      .orderBy("event_id")
      .select(col("event_id"), col("first_touch_type"), col("last_touch_type"))
      .as[(Long, Option[String], Option[String])].collect().toSeq
    assert(out === Seq(
      (3L, Some("view"), Some("click")),
      (5L, None, None)))
  }

  test("attribution: same-timestamp touch counts only with a smaller id (exclusive frame)") {
    val events = idEv(
      (10L, 1L, "2024-01-01 10:00:00", "click", 0.0), // same ts, smaller id → counts
      (11L, 1L, "2024-01-01 10:00:00", "purchase", 5.0),
      (12L, 1L, "2024-01-01 10:00:00", "view", 0.0)) // same ts, larger id → excluded
    val out = Analytics.attribution(events, Seq("click", "view"), "purchase")
      .select(col("first_touch_type"), col("last_touch_type"))
      .as[(Option[String], Option[String])].collect().toSeq
    assert(out === Seq((Some("click"), Some("click"))))
  }

  // ---------------- sessionize ----------------

  private def sessEv(xs: (Long, Long, String)*): DataFrame =
    xs.toDF("event_id", "user_id", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")

  test("sessionize: a gap strictly over the threshold opens a new session") {
    val events = sessEv(
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 10:20:00"), // 1200s ≤ 1800 → same session
      (3L, 1L, "2024-01-01 10:50:00"), // exactly 1800s → still same
      (4L, 1L, "2024-01-01 11:20:01"), // 1801s → new session
      (5L, 2L, "2024-01-01 10:00:00")) // other user: own numbering
    val out = Analytics.sessionize(events, gapSeconds = 1800)
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events", "duration_s")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 3L, 3000L), (1L, 2L, 1L, 0L), (2L, 1L, 1L, 0L)))
  }

  test("sessionize: duplicate timestamps are ordered by event id (deterministic)") {
    val events = sessEv(
      (2L, 1L, "2024-01-01 10:00:00"),
      (1L, 1L, "2024-01-01 10:00:00"), // same instant, lower id first
      (3L, 1L, "2024-01-01 12:00:00"))
    val out = Analytics.sessionize(events, gapSeconds = 60)
      .orderBy("session_seq")
      .select("session_seq", "n_events").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L), (2L, 1L)))
  }

  test("seasonalDecompose: additive identity holds; flat series has zero seasonal+residual") {
    import java.time.LocalDate
    // one event per day, constant 10.0, 21 days: trend = seasonal-free
    val rows = (0 until 21).map { i =>
      (1L, 1L, s"2024-01-${"%02d".format(1 + i)} 10:00:00", "flat", 10.0)
    }
    val events = rows.toDF("event_id", "user_id", "tss", "event_type", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = Analytics.seasonalDecompose(events)
      .orderBy("day")
      .select("v_micro", "trend_micro", "seasonal_micro", "residual_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 21)
    // flat: every day sums to 10e6; trend = mean = 10e6; seasonal = 0
    assert(out.forall { case (v, t, s, r) => v == 10000000L && t == 10000000L && s == 0L && r == 0L })
  }

  test("seasonalDecompose: weekly pattern lands in seasonal, identity always exact") {
    // 28 days, weekends (epoch-dow pattern) doubled
    val rows = (0 until 28).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      val dow = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(1970, 1, 1), day) % 7
      val v = if (dow == 0L) 20.0 else 10.0
      (i.toLong, 1L, s"$day 10:00:00", "weekly", v)
    }
    val events = rows.toDF("event_id", "user_id", "tss", "event_type", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = Analytics.seasonalDecompose(events)
      .select("v_micro", "dow", "trend_micro", "seasonal_micro", "residual_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the additive identity is exact by construction on every row
    assert(out.forall { case (v, _, t, s, r) => v == t + s + r })
    // the spiked dow carries the strictly largest seasonal component
    val byDow = out.groupBy(_._2).view.mapValues(_.head._4).toMap
    assert((1L to 6L).forall(d => byDow(0L) > byDow(d)), byDow.toString)
  }

  test("sessionize plan: one exchange serves both windows and the rollup") {
    val events = graft.Tables.events(spark, sf001)
    val plan = Analytics.sessionize(events, gapSeconds = 1800)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected a single user-keyed exchange:\n$plan")
  }
}
