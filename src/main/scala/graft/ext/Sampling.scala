package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus sampling and statistics for training-data pipelines
  * (SURVEY §2.5 E-suite extensions).
  *
  * Sampling here is HASH-BASED, not RNG-based: a row is kept iff the
  * engine-neutral hash of its id falls under the rate threshold. That is
  * the reproducible-sampling pattern real training pipelines use —
  * the same rows are selected on every run, every engine, every
  * partitioning (RNG sampling depends on partition layout and seed
  * plumbing), membership is stable under incremental reprocessing, and
  * an external engine can replay the selection exactly (so the driver
  * oracle-checks it). Map-only: the filter rides the scan.
  */
object Sampling {

  /** Keep a row iff hash(id) mod 1000 < permille — deterministic,
    * engine-neutral ([[Dedup.portableHash24]]). */
  def hashKeep(idCol: Column, permille: Column): Column =
    Dedup.portableHash24(idCol.cast(StringType)) % 1000 < permille

  /** Uniform deterministic sample at `permille`/1000 rate. */
  def hashSample(df: DataFrame, idCol: String, permille: Int): DataFrame =
    df.filter(hashKeep(col(idCol), lit(permille)))

  /** Stratified deterministic sample: per-stratum rates (‰) with a
    * default for unlisted strata — the "data mixing" step that
    * up/down-weights sources into a training blend. */
  def stratifiedHashSample(
      df: DataFrame, idCol: String, strataCol: String,
      permille: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = permille.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hashKeep(col(idCol), rate))
  }

  /** Exact per-stratum cap: keep the `cap` rows with the smallest
    * engine-neutral hash in each stratum — the domain-balancing step
    * that bounds an over-represented source at an exact row count
    * ([[stratifiedHashSample]] bounds it only in expectation). The
    * hash order is pseudorandom w.r.t. every corpus attribute but
    * identical on every run and engine, and the kept set is a prefix:
    * raising the cap only adds rows, so incremental re-mixes are
    * supersets. Ties (24-bit hash collisions) break on the id, so the
    * selection is total.
    *
    * Shape: ONE shuffle on the stratum; Spark's window sort is
    * external (spills), so a dominant stratum is bounded by disk, not
    * heap. At 100 TB with a stratum many orders larger than `cap`,
    * pre-filter with the expectation-rate [[stratifiedHashSample]] at
    * a couple of times the cap's rate before the exact rank, so the
    * per-stratum sort sees O(cap) rows instead of the full stratum. */
  def capPerStratum(df: DataFrame, idCol: String, strataCol: String,
      cap: Int): DataFrame = {
    val h = Dedup.portableHash24(col(idCol).cast(StringType))
    df.withColumn("rank_in_stratum",
        row_number().over(Window.partitionBy(col(strataCol)).orderBy(h, col(idCol)))
          .cast(LongType))
      .filter(col("rank_in_stratum") <= cap)
  }

  /** PER-ROW weighted sampling without replacement — priority sampling
    * (Duffield, Lund & Thorup, "Priority sampling for estimation of
    * arbitrary subset sums", JACM 54(6), 2007). Each row draws
    * u = (hash24(id)+1)/2^24 ∈ (0,1] and gets priority q = w/u; the k
    * highest priorities are the sample. With τ = the (k+1)-th priority,
    * each kept row carries the Horvitz-Thompson weight est_w = max(w, τ)
    * — subset-sum estimates over the sample are unbiased (the DLT
    * estimator), so the sample can stand in for the corpus in
    * token-count accounting. Rows with weight ≥ τ are ALWAYS kept
    * (heavy documents can't be missed); light rows are kept with
    * probability proportional to weight.
    *
    * The "uniform" is the same engine-neutral id hash the rest of the
    * sampling suite uses: membership is reproducible across runs,
    * engines and partitionings, and replayable by the oracle. Float
    * discipline: priority = (w·2^24)/(h+1) — the product is exact in
    * f64 for any realistic weight, the division is one correctly-
    * rounded op, and est_w is a max of exactly-representable values, so
    * the whole output hashes bit-for-bit.
    *
    * Shape: the top-(k+1) select is a `TakeOrderedAndProject` —
    * map-side per-partition heaps of k+1 rows, ONE bounded reduce, the
    * corpus never shuffles. The rank/threshold window then runs on a
    * (k+1)-row frame (single partition by construction — bounded, not a
    * scale hazard). Weights must be ≥ 1 and non-null — enforced in the
    * plan (ADVICE r14): a zero/negative weight pins priority ≤ 0 and
    * silently biases the sample, and a NULL weight yields NULL-priority
    * rows that can leak into the kept set when the population is ≤ k.
    * The guard is a `raise_error` branch on the weight expression, so a
    * bad weight fails the job loudly mid-scan instead of corrupting the
    * estimate; valid rows pay one codegen'd comparison. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val h = Dedup.portableHash24(col(idCol).cast(StringType))
    val w = col(weightCol).cast(DoubleType)
    val checkedW = when(w.isNull.or(w < 1.0),
        raise_error(concat(
          lit(s"prioritySample: weight '$weightCol' must be >= 1 and non-null, got "),
          coalesce(w.cast(StringType), lit("NULL")),
          lit(" for id "), col(idCol).cast(StringType))))
      .otherwise(w)
    val keyed = df.withColumn("priority",
      (checkedW * lit(16777216.0)) / (h + lit(1L)).cast(DoubleType))
    val top = keyed.orderBy(col("priority").desc, col(idCol)).limit(k + 1)
    // rank and threshold ride ONE pass over the same (k+1)-row frame (a
    // whole-frame window aggregate, not a second corpus scan): τ is the
    // (k+1)-th priority, null when the population is ≤ k
    val ranked = top
      .withColumn("__rnp",
        row_number().over(Window.orderBy(col("priority").desc, col(idCol))))
      .withColumn("__tau",
        min(when(col("__rnp") === k + 1, col("priority"))).over(Window.partitionBy()))
    ranked.filter(col("__rnp") <= k)
      .withColumn("est_w",
        when(col("__tau").isNull, col(weightCol).cast(DoubleType))
          .otherwise(greatest(col(weightCol).cast(DoubleType), col("__tau"))))
      .drop("__rnp", "__tau")
  }

  /** Deterministic global shuffle: place every row at a reproducible
    * (shard, pos) — the "shuffle once, write N training shards" step
    * at the end of a corpus pipeline. `shard = hash(id) % nShards`
    * spreads rows uniformly; `pos` orders a shard by the same hash
    * (id tiebreak), so consumption order is pseudorandom w.r.t. any
    * corpus attribute (source, date, length) yet bit-identical across
    * runs and engines — the property training-data loaders need for
    * resumable, reproducible epochs.
    *
    * ONE shuffle on the shard; the within-shard sort rides the window
    * partition. A writer pipeline uses the same two keys as
    * `repartition(nShards, shard) + sortWithinPartitions(h, id)` —
    * same exchange, no rank materialized. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val h = Dedup.portableHash24(col(idCol).cast(StringType))
    df.withColumn("shard", (h % nShards).cast(IntegerType))
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(h, col(idCol)))
          .cast(LongType))
  }

  /** Temperature-weighted mixture sampling — the multilingual-blend
    * step of an LLM data pipeline (the `p_l ∝ n_l^alpha` smoothing of
    * Lample & Conneau 2019 §3.1 / mBERT's exponential smoothing):
    * per-stratum sampling RATES are DERIVED from the corpus's own
    * counts, up-weighting low-resource strata relative to their share,
    * then membership is the same engine-neutral hash threshold the rest
    * of the sampling suite uses (reproducible, partition-independent,
    * incrementally stable).
    *
    * rate_s = min(1, budget · n_s^alpha / Σ_t n_t^alpha / n_s), keep iff
    * hash24(id) < rate_s · 2^24. Expected take ≈ budget, capped per
    * stratum at its population.
    *
    * Float discipline: alpha = 0.5 routes through `sqrt` (correctly
    * rounded IEEE op on BOTH engines, unlike libm `pow`), every other
    * step is a single correctly-rounded op in pinned order, and the only
    * cross-row float SUM is over the handful of stratum weights — a
    * membership flip would need a 24-bit hash value within ~1e-16 of a
    * rate boundary. The OUTPUT carries no floats at all (ids, strata,
    * counts), so the report hashes exactly.
    *
    * Shape: one partial-agg exchange over stratum counts (tiny), a
    * 1-row total broadcast back over the counts frame, and a broadcast
    * join of the per-stratum rate onto the corpus — the corpus itself
    * is filtered MAP-SIDE, never shuffled. */
  def temperatureMixtureSample(df: DataFrame, idCol: String,
      strataCol: String, alpha: Double, budget: Long): DataFrame = {
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_stratum"))
    val w =
      if (alpha == 0.5) sqrt(col("n_stratum").cast(DoubleType))
      else pow(col("n_stratum").cast(DoubleType), lit(alpha))
    val weighted = counts.withColumn("w", w)
    val total = weighted.agg(sum(col("w")).as("tw"))
    // 1-row broadcast total (the e30 corpus-count pattern), then the
    // pinned-order rate expression: budget · w / tw / n, capped at 1
    val rates = weighted.crossJoin(broadcast(total))
      .withColumn("rate",
        least(lit(1.0), lit(budget.toDouble) * col("w") / col("tw") / col("n_stratum")))
      .select(col(strataCol), col("n_stratum"), col("rate"))
    df.join(broadcast(rates), strataCol)
      .filter(Dedup.portableHash24(col(idCol).cast(StringType)).cast(DoubleType)
        < col("rate") * lit(16777216.0))
      .select(col(idCol), col(strataCol), col("n_stratum"))
  }

  /** Leakage-safe train/val/test split: assignment is by NEAR-DUP
    * CLUSTER, not by document — the split-contamination guard of an LLM
    * data pipeline. A plain per-doc hash split leaks test material into
    * train through near-duplicates (the dedup pipeline's own candidate
    * pairs prove they exist); splitting on the cluster representative
    * puts every member of a near-dup family on the SAME side of the
    * boundary, so nothing adjacent to a test doc can train.
    *
    * `candidatePairs` is any (doc1, doc2) near-dup pair frame (MinHash
    * bands, SimHash, embedding-LSH — the caller picks the notion of
    * "near"); clusters come from the O(log diameter) connected-
    * components pass, singletons stay their own key. Membership is the
    * engine-neutral hash of the CLUSTER key against permille bands, so
    * the split is reproducible, partition-independent, and stable under
    * re-runs; growing the corpus only moves docs whose cluster
    * membership itself changed.
    *
    * Shape: CC over the pairs (compact keys, log rounds), one join of
    * the cluster map onto the corpus (clusters frame ≈ only docs with a
    * near-dup, typically a small fraction — AQE broadcasts it when it
    * fits), then a map-side hash verdict. The corpus never shuffles. */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      candidatePairs: DataFrame, valPermille: Int, testPermille: Int): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000,
      s"split bands out of range: val=$valPermille test=$testPermille")
    val reps = Dedup.connectedComponents(candidatePairs)
      .select(col("doc_id").as(idCol), col("cluster_rep"))
    val keyed = docs.join(reps, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster_rep"), col(idCol)))
    val h = Dedup.portableHash24(col("split_key").cast(StringType)) % 1000
    keyed
      .withColumn("split",
        when(h < testPermille, lit("test"))
          .when(h < testPermille + valPermille, lit("val"))
          .otherwise(lit("train")))
      .select(col(idCol), col("split_key"), col("split"))
  }

  /** Per-stratum length statistics: count, mean (decimal-exact then
    * divided, order-independent — the suite's float rule), and exact
    * interpolated percentiles. Exact `percentile` sorts per group —
    * at 100 TB switch to `percentile_approx` when a bounded error is
    * acceptable; declared exact so the external oracle can match it. */
  def lengthStats(df: DataFrame, strataCol: String, textCol: String,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val n = length(col(textCol))
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      (sum(n.cast(DecimalType(38, 6))).cast(DoubleType) / count(n)).as("mean_len")) ++
      ps.map(p => call_function("percentile", n, lit(p)).as(s"p${(p * 100).round}"))
    require(ps.map(p => (p * 100).round).distinct.size == ps.size,
      s"percentile labels collide: $ps")
    df.groupBy(col(strataCol)).agg(aggs.head, aggs.tail: _*)
  }
}
