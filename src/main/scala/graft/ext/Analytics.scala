package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Qh

/** Serving-side behavioral analytics over the events stream: funnel
  * conversion, cost-spike detection (the FinOps anomaly surface a
  * cloud-cost engine serves — the reference's dashboards read daily
  * cost aggregates, `sql/views.sql`; flagging the outlier days is the
  * query users run against them), and cohort retention.
  *
  * All three are pure aggregate/join compositions — no window sorts,
  * no per-user collected state — so each scales as its shuffles:
  * one user-keyed exchange per funnel step, one (key, day) exchange
  * for spikes, one (user, week) distinct for cohorts.
  */
object Analytics {

  /** Ordered-funnel conversion: for each user, the earliest time they
    * completed step 1, then step 2 STRICTLY AFTER step 1, … Returns one
    * row per user who completed at least step 1: `step{i}_ts`
    * (nullable beyond their progress) and `steps_completed`.
    *
    * Shape per step k: filter events to the step's type (predicate
    * pushes to the scan), join user-keyed against the k-1 frontier,
    * keep events after the frontier time, take `min(ts)` — a
    * map-side-combined aggregate. The frontier is one row per
    * still-converting user, shrinking every step; all joins share the
    * user-key partitioning, so AQE reuses the exchange layout rather
    * than re-shuffling the frontier. No broadcast assumption: the user
    * dimension is unbounded at 100 TB, and nothing here requires it to
    * fit anywhere.
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "Analytics.funnel: steps must be non-empty")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step1_ts"))
    val joined = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"step${i}_ts"
        val cur = s"step${i + 1}_ts"
        val next = events.filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol))
          .join(acc.select(col(userCol), col(prev)), Seq(userCol))
          .filter(col(tsCol) > col(prev))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
        acc.join(next, Seq(userCol), "left")
    }
    // fold inner→outer so the DEEPEST step's check lands outermost:
    // the final expression reads when(stepN…, N).otherwise(…step1…, 1)
    val completed = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"step${i + 1}_ts").isNotNull, lit(i + 1)).otherwise(acc)
    }
    joined.withColumn("steps_completed", completed)
  }

  /** Daily cost-spike detection: days whose cost exceeds `threshold` ×
    * the key's own mean daily cost. Emits (key, day, daily_cost,
    * ratio) for flagged days.
    *
    * Determinism (the oracle-parity contract): daily sums are exact
    * DECIMAL(38,6); the key's total is the decimal SUM OF THE DAILY
    * DECIMALS (associative — bit-equal to summing raw rows), and the
    * ratio is computed in double from those exact operands, so both
    * engines do the identical IEEE divisions. The per-key stats frame
    * is one row per key — broadcast back onto the daily frame.
    */
  def dailySpikes(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      valueCol: String = "value",
      threshold: Double = 1.5): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast(Qh.Dec)).as("sum_dec"))
    val stats = daily.groupBy(col(keyCol))
      .agg(sum(col("sum_dec")).cast(Qh.Dec).as("total_dec"),
        count(lit(1)).as("n_days"))
    daily.join(broadcast(stats), Seq(keyCol))
      .select(
        col(keyCol), col("day"),
        col("sum_dec").cast(DoubleType).as("daily_cost"),
        (col("sum_dec").cast(DoubleType) * col("n_days") /
          col("total_dec").cast(DoubleType)).as("ratio"))
      .filter(col("ratio") > lit(threshold))
  }

  /** Per-key daily forward fill: build each key's full day spine
    * between its first and last observed day (`sequence` — generated
    * in-row, no driver loop, unlike a recursive spine this needs no
    * iteration limit), left-join the observed daily costs on, and
    * carry the last observed value forward with an ignore-nulls
    * running `last` (the gap-filling read every time-series dashboard
    * does — c52 zero-fills a month spine; this is the
    * carry-last-observation semantics).
    *
    * Emits (key, day, observed 0/1, filled_cost). Scale: the window
    * partitions by key — each key's spine is bounded by its day span,
    * so no partition outgrows time itself; the daily frame is already
    * one row per (key, day).
    */
  def forwardFill(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast(Qh.Dec)).cast(DoubleType).as("cost"))
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        col("cost").isNotNull.cast("int").as("observed"),
        last(col("cost"), ignoreNulls = true).over(w).as("filled_cost"))
  }

  /** Weekly cohort retention: users bucketed by the week they were
    * first seen; for each (cohort week, weeks-since) cell, how many of
    * them were active. Monday-start ISO weeks (`date_trunc("week")` —
    * the same convention DuckDB uses, so offsets are exact integers).
    *
    * Shape: one distinct over (user, week) — the only exchange that
    * sees event-scale data, and it carries 16-byte rows; the first-seen
    * frame is one row per user, joined user-keyed; the output is
    * O(weeks²) cells.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val weekly = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    val cohorts = weekly.groupBy(col(userCol))
      .agg(min(col("week")).as("cohort_week"))
    weekly.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** Rolling z-score anomaly detection over per-key daily costs: a day
    * is anomalous when it deviates from ITS OWN trailing 7-day window
    * by more than `zThreshold` standard deviations — the windowed
    * restatement of [[dailySpikes]] (which compares against the key's
    * all-time mean): a gradual ramp never trips this detector, a step
    * change does.
    *
    * Determinism (oracle-parity): z is computed as the algebraically
    * identical `(n·x − Σx) / √(n·Σx² − (Σx)²)` with BOTH operands kept
    * in EXACT DECIMAL arithmetic until one final small-magnitude cast
    * each — x² by exact (16,6)×(16,6) → (33,12) multiplication, window
    * sums decimal (order-independent — a float moving sum would depend
    * on the engine's frame-evaluation order, e.g. DuckDB's segment
    * trees), numerator exact at scale 6, and the radicand quantized to
    * an INTEGER via explicit `round(…, 6)` then `floor` (both
    * half-away/floor on positives in BOTH engines — a scale-reducing
    * decimal CAST is not portable: Spark's rounds, DuckDB's truncates;
    * Cauchy–Schwarz keeps the radicand ≥ 0, and one that floors to 0 —
    * sub-unit variance on cost totals — is treated as flat).
    * Why the contortion, twice over: (a) squaring the daily total as a
    * DOUBLE and casting to decimal diverges at ~1e12 magnitude, where
    * a double's ulp is coarser than the decimal's 1e-6 step, so
    * shortest-string rounding (Spark) and exact-binary rounding
    * (DuckDB) disagree in the 6th decimal; (b) even an exact Σx² at
    * scale 12 can't be CAST to double portably — DuckDB converts
    * int128-unscaled-then-divides (two roundings), Spark rounds the
    * decimal value once, and the E[x²]−E[x]² cancellation amplifies
    * that last-bit disagreement to ~1e-13 in z. Both were caught by
    * the sf1 parity sweep; the exact-decimal/small-cast form removes
    * every non-portable conversion: the two values that reach IEEE
    * arithmetic are bit-identical on both engines. Windows shorter
    * than `minDays` are suppressed — a 1-day "window" calls everything
    * normal and a 2-day one calls everything ±1σ.
    *
    * Scale: ONE hash exchange on the key for the window sort; frame
    * state is 7 rows regardless of data size; the daily pre-aggregation
    * reduces map-side before that exchange, so the window input is
    * |keys|×|days| rows, not event-scale.
    */
  def rollingAnomalies(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts",
      valueCol: String = "value",
      zThreshold: Double = 1.5,
      minDays: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast(Qh.Dec)).as("xd"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(-6, Window.currentRow)
    // (16,6) gives ×(16,6) → (33,12): exact inside decimal128 with
    // 10-digit integral headroom on the daily total (ANSI faults on
    // overflow rather than rounding silently)
    val xn = col("xd").cast(DecimalType(16, 6))
    val n3 = col("n").cast(DecimalType(3, 0)) // frame ≤ 7 rows
    // numerator n·x − Σx: every step exact at scale 6
    val num = (n3 * xn).cast(DecimalType(38, 6)) - col("sxd")
    // radicand n·Σx² − (Σx)²: both products exact at scale 12, each
    // EXPLICITLY rounded at scale 6 (`round` is half-away-from-zero on
    // positives in both engines — a scale-reducing CAST is NOT
    // portable: Spark's rounds, DuckDB's truncates), subtracted
    // exactly, then floored to an integer — the only rounding chain,
    // identical on both engines
    val rad = floor(
      round(n3 * col("sxxd").cast(DecimalType(34, 12)), 6) -
        round(col("sxd").cast(DecimalType(18, 6)) * col("sxd").cast(DecimalType(18, 6)), 6))
    daily
      .select(col(keyCol), col("day"), col("xd"),
        sum(col("xd")).over(w).as("sxd"),
        sum(xn * xn).over(w).as("sxxd"),
        count(lit(1)).over(w).as("n"))
      .select(col(keyCol), col("day"), col("xd").cast(DoubleType).as("daily_cost"), col("n"),
        when(rad > 0, num.cast(DoubleType) / sqrt(rad.cast(DoubleType)))
          .otherwise(lit(0.0)).as("z"))
      .filter(col("n") >= minDays && abs(col("z")) > zThreshold)
  }

  /** Equi-width histogram of a numeric column: `nBins` buckets spanning
    * the global [min, max], each with its row count and exact decimal
    * value sum — the distribution profile a catalog/BI layer renders
    * (and the column-statistics shape a CBO feeds on; e71 profiles
    * moments/NDV, this bins the density).
    *
    * Bin assignment is `least(floor((x − lo) / width), nBins−1)` — pure
    * elementwise IEEE arithmetic, bit-identical on any engine (unlike
    * `width_bucket`, whose edge conventions differ across engines); the
    * max value folds into the last bin. Bounds come from one map-side-
    * combined min/max aggregate, broadcast back onto the scan — two
    * scans total, no shuffle of the data itself (the per-bin aggregate
    * combines map-side into ≤ nBins rows per task).
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int = 20): DataFrame = {
    require(nBins > 0, s"Analytics.histogram: nBins must be positive, got $nBins")
    val stats = df.agg(
      min(col(valueCol)).cast(DoubleType).as("lo"),
      max(col(valueCol)).cast(DoubleType).as("hi"))
    val width = (col("hi") - col("lo")) / lit(nBins.toDouble)
    // degenerate single-value domain: width 0 would put NaN through
    // floor — everything belongs in bin 0 (never fires when lo < hi,
    // so oracle parity on real data is untouched)
    val bin = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(floor((col(valueCol) - col("lo")) / width), lit(nBins - 1).cast("long")))
    df.join(broadcast(stats))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), Qh.dsum(col(valueCol)).as("total"))
  }

  /** First/last-touch attribution: each conversion event credited to
    * the user's first and most recent PRECEDING touch events (e.g.
    * click/view before a purchase) — the marketing-attribution read
    * over any behavioral event stream.
    *
    * One window per user ordered by (ts, id) with an EXCLUSIVE frame
    * (unbounded preceding → 1 preceding, so a conversion that is
    * itself a touch type never credits itself); first/last with
    * ignoreNulls carry the touch columns across non-touch rows.
    * Conversions with no prior touch keep NULL credits (organic).
    *
    * Scale: ONE hash exchange on the user key serves all four carried
    * columns (same partitioning+ordering); per-user groups are
    * bounded, no driver state. The touch/conversion predicates are
    * simple `IN` filters evaluated in-row.
    */
  def attribution(
      events: DataFrame,
      touchTypes: Seq[String],
      conversionType: String,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(touchTypes.nonEmpty, "Analytics.attribution: touchTypes must be non-empty")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val touchTs = when(isTouch, col(tsCol))
    val touchType = when(isTouch, col(typeCol))
    events
      .select(col(idCol), col(userCol), col(tsCol), col(typeCol), col(valueCol),
        first(touchTs, ignoreNulls = true).over(w).as("first_touch_ts"),
        first(touchType, ignoreNulls = true).over(w).as("first_touch_type"),
        last(touchTs, ignoreNulls = true).over(w).as("last_touch_ts"),
        last(touchType, ignoreNulls = true).over(w).as("last_touch_type"))
      .filter(col(typeCol) === conversionType)
      .drop(typeCol)
  }

  /** Additive SEASONAL DECOMPOSITION of a daily series —
    * `value = trend + seasonal + residual` — the FinOps anomaly
    * primitive one level up from [[rollingAnomalies]]: weekly
    * seasonality (weekend dips, Monday batch spikes) must come OUT of
    * the series before a deviation means anything. Per key:
    *
    *  - `trend` = centered 7-observed-day rolling mean,
    *  - `seasonal` = day-of-week mean minus the key's overall mean,
    *  - `residual` = the remainder (the alarm feed).
    *
    * Exactness (the float-portability discipline): daily values are
    * exact micro sums; every mean is an integer division of a
    * NON-NEGATIVE sum — truncating `div` ≡ flooring `//`, so the two
    * engines agree (a mean over signed values would NOT round-trip:
    * Spark `div` truncates toward zero, DuckDB `//` floors — which is
    * why `seasonal` is defined as a difference of two positive-sum
    * means rather than a mean of signed detrended values). Day-of-week
    * is epoch-day mod 7 — engine-neutral, unlike the engines'
    * conflicting dayofweek numberings. Scale: one (key, day) aggregate
    * and three windows sharing the key partitioning — a single
    * exchange; per-key windows bounded by the day count. */
  def seasonalDecompose(
      events: DataFrame,
      typeCol: String = "event_type",
      tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(sum(floor(col(valueCol) * lit(1000000.0)).cast("long")).as("__v_raw"))
      // loud guard for the documented non-negativity assumption: every
      // mean below divides a sum of daily values, and truncating `div`
      // ≡ flooring `//` ONLY for non-negative sums — a negative daily
      // total (refunds/credits) would silently diverge from the
      // oracle's floor division instead of failing
      .withColumn("v_micro",
        when(col("__v_raw") < 0L, raise_error(concat(
          lit("seasonalDecompose: negative daily sum (v_micro="),
          col("__v_raw").cast("string"),
          lit(") violates the non-negative-series contract — truncating"
            + " div diverges from floor division on negative sums"))).cast("long"))
          .otherwise(col("__v_raw")))
      .drop("__v_raw")
    val w7 = Window.partitionBy(col(typeCol)).orderBy(col("day")).rowsBetween(-3, 3)
    val wDow = Window.partitionBy(col(typeCol), col("dow"))
    val wAll = Window.partitionBy(col(typeCol))
    daily
      .withColumn("__s7", sum(col("v_micro")).over(w7))
      .withColumn("__c7", count(lit(1)).over(w7))
      .withColumn("trend_micro", expr("__s7 div __c7"))
      .withColumn("dow",
        pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7)).cast("long"))
      .withColumn("__sd", sum(col("v_micro")).over(wDow))
      .withColumn("__cd", count(lit(1)).over(wDow))
      .withColumn("__sa", sum(col("v_micro")).over(wAll))
      .withColumn("__ca", count(lit(1)).over(wAll))
      .withColumn("seasonal_micro", expr("__sd div __cd - __sa div __ca"))
      .withColumn("residual_micro",
        col("v_micro") - col("trend_micro") - col("seasonal_micro"))
      .select(col(typeCol), col("day"), col("v_micro"), col("dow"),
        col("trend_micro"), col("seasonal_micro"), col("residual_micro"))
  }

  /** Batch gap-sessionization: the classic two-window assignment —
    * `lag` flags a session break when the gap to the previous event
    * exceeds `gapSeconds`, a running `sum` of the flags numbers the
    * sessions per user, then one aggregate rolls each session up. The
    * batch complement of the streaming timer sessions (c56 /
    * [[graft.streaming.GapSessions]]): same semantics on data at rest,
    * where one sort-per-user-partition beats maintaining state.
    *
    * One exchange total: both windows and the final aggregate share the
    * user-key partitioning, so Spark plans a single shuffle and reuses
    * its sort. Ordering is made total with the event-id tiebreak —
    * duplicate timestamps otherwise make `lag` nondeterministic.
    * Gap arithmetic is in whole epoch seconds (`unix_timestamp` floors,
    * matching DuckDB `date_diff('second', ..)` boundary counting), so
    * every comparison and every output column is exact integer math.
    */
  def sessionize(
      events: DataFrame,
      gapSeconds: Long,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gapSeconds > 0, "Analytics.sessionize: gapSeconds must be positive")
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(order)
    val isBreak = prev.isNull ||
      unix_timestamp(col(tsCol)) - unix_timestamp(prev) > gapSeconds
    val sess = sum(when(isBreak, 1L).otherwise(0L))
      .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    events
      .withColumn("session_seq", sess)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"))
      .withColumn("duration_s",
        unix_timestamp(col("last_ts")) - unix_timestamp(col("first_ts")))
  }
}
