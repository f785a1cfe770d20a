package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  private def skewed = {
    import spark.implicits._
    // 10k rows of one hot key + a long tail
    ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong)))
      .toDF("k", "v")
  }

  private def dim = {
    import spark.implicits._
    (Seq(("hot", "H")) ++ (1 to 100).map(i => (s"k$i", s"D$i")))
      .toDF("k", "label")
  }

  test("salted inner join returns exactly the plain join's result") {
    val plain = skewed.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join preserves unmatched rows") {
    import spark.implicits._
    val big = skewed.union(Seq(("orphan", 0L)).toDF("k", "v"))
    val salted = Skew.saltedJoin(big, dim, Seq("k"), factor = 4, joinType = "left")
    assert(salted.filter(col("k") === "orphan").count() == 1)
    assert(salted.filter(col("k") === "orphan" && col("label").isNull).count() == 1)
    assert(salted.count() == big.count())
  }

  test("the hot key actually spreads across salt buckets") {
    val hot = skewed.filter(col("k") === "hot")
    val salts = Skew.withRowSalt(hot, 8)
      .select("__salt").distinct().count()
    assert(salts >= 6, s"expected the hot key across most of 8 buckets, got $salts")
  }

  test("salt assignment is replay-deterministic: input ORDER cannot change it") {
    import spark.implicits._
    // a shuffle-rooted upstream delivers its partition in nondeterministic
    // order; the canonicalization sort must make (row -> salt) a pure
    // function of the partition's row multiset, or a recomputed task
    // re-salts rows differently and the downstream (keys, salt) shuffle
    // duplicates/loses rows
    val rows = (1 to 500).map(i => (s"k${i % 7}", i.toLong))
    val fwd = rows.toDF("k", "v").coalesce(1)
    val rev = rows.reverse.toDF("k", "v").coalesce(1)
    val a = Skew.withRowSalt(fwd, 8).collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    val b = Skew.withRowSalt(rev, 8).collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    assert(a.sameElements(b), "same multiset, different arrival order -> same salts")
  }

  test("a hot key of BIT-IDENTICAL duplicate rows still spreads (r13 degenerate salt)") {
    import spark.implicits._
    // the shape salting exists for: one hot key whose rows are exact
    // copies (a default/placeholder row repeated). The r13 whole-row-only
    // salt hashed all of them to ONE bucket — zero spread.
    val dups = ((1 to 8000).map(_ => ("hot", 0L)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("k", "v")
      .repartition(4) // multiple partitions: the id must spread within AND across
    val hot = dups.filter(col("k") === "hot")
    val salts = Skew.withRowSalt(hot, 8)
      .select("__salt").distinct().count()
    assert(salts >= 6, s"identical rows must spread across most of 8 buckets, got $salts")
    // and the salted join still returns exactly the plain join's multiset
    val plain = dups.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(dups, dim, Seq("k"), factor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("measureFrame is null-free on empty and all-NULL-key input (ADVICE r13)") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    val er = Skew.measureFrame(empty, "k").collect().head
    assert(!(0 until er.length).exists(er.isNullAt), s"empty-input frame has NULLs: $er")
    val es = Skew.measure(empty, "k")
    assert(es.nRows == 0L && es.skewRatio == 1.0 && es.hotMassLB == 0.0 && es.f2Est == 0.0)
    val allNull = Seq((null: String, 1L), (null: String, 2L)).toDF("k", "v")
    val nr = Skew.measureFrame(allNull, "k").collect().head
    assert(!(0 until nr.length).exists(nr.isNullAt), s"all-NULL frame has NULLs: $nr")
    val ns = Skew.measure(allNull, "k")
    assert(ns.nRows == 0L && ns.nullRows == 2L && ns.nullFraction == 1.0)
  }

  test("measure: sketch stats read ~1.0 on uniform keys and >> 1 on the hot-key bag") {
    import spark.implicits._
    val uniform = (1 to 5000).map(i => (s"k$i", i.toLong)).toDF("k", "v")
    val su = Skew.measure(uniform, "k")
    // all-distinct keys: F2 == n, D == n → ratio == 1 up to sketch noise
    assert(su.nRows == 5000L)
    assert(su.skewRatio > 0.3 && su.skewRatio < 3.0, s"uniform ratio: $su")
    val ss = Skew.measure(skewed, "k")
    // one key owns 99% of 10.1k rows: F2 ≈ n², D ≈ 101 → ratio ≈ D
    assert(ss.skewRatio > 20.0, s"skewed ratio must scream: $ss")
    // nulls scope out of the hash sketches but stay VISIBLE as counts
    val withNulls = skewed.union(Seq((null: String, 0L)).toDF("k", "v"))
    val sn = Skew.measure(withNulls, "k")
    assert(sn.nRows == ss.nRows && sn.nullRows == 1L)
  }

  test("low-cardinality pathology: skewRatio saturates but hotMassLB still salts; right joins refused") {
    import spark.implicits._
    // 3 distinct keys, one owning ~99.8%: skewRatio caps at ~D=3
    // (below the 4.0 threshold) — the absolute mass bound must fire
    val lowCard = ((1 to 5000).map(i => ("hot", i.toLong)) ++
      Seq(("a", 1L), ("b", 2L))).toDF("k", "v")
    val dim3 = Seq(("hot", "H"), ("a", "A"), ("b", "B")).toDF("k", "label")
    val (joined, stats, salted) = Skew.autoSaltedJoin(lowCard, dim3, "k")
    assert(stats.skewRatio < 4.0, s"fixture regression — ratio must saturate: $stats")
    assert(salted && stats.hotMassLB > 0.9, s"mass bound must catch it: $stats")
    assert(joined.count() == 5002)
    // a null-heavy big side under a LEFT join is a one-partition
    // straggler — salted even though the non-null tail is uniform
    val nullHeavy = ((1 to 900).map(_ => (null: String, 0L)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val (leftJoined, nullStats, nullSalted) =
      Skew.autoSaltedJoin(nullHeavy, dim, "k", joinType = "left")
    assert(nullSalted && nullStats.nullFraction == 0.9, nullStats.toString)
    assert(leftJoined.count() == 1000, "left join keeps every big row")
    // outside saltedJoin's correctness scope: refuse loudly
    val e = intercept[IllegalArgumentException] {
      Skew.autoSaltedJoin(lowCard, dim3, "k", joinType = "right")
    }
    assert(e.getMessage.contains("inner/left"))
  }

  test("autoSaltedJoin: salts the hot bag, joins uniform plain, same rows either way") {
    import spark.implicits._
    val (hotJoined, hotStats, hotSalted) = Skew.autoSaltedJoin(skewed, dim, "k")
    assert(hotSalted, s"hot bag must trigger salting: $hotStats")
    assert(hotJoined.count() == skewed.join(dim, Seq("k")).count())
    val uniform = (1 to 100).map(i => (s"k$i", i.toLong)).toDF("k", "v")
    val (plainJoined, plainStats, plainSalted) = Skew.autoSaltedJoin(uniform, dim, "k")
    assert(!plainSalted, s"uniform keys must not salt: $plainStats")
    assert(plainJoined.count() == 100)
    // the decision is visible in the plan: only the salted path
    // replicates the dim side through an explode
    assert(hotJoined.queryExecution.executedPlan.toString.contains("explode"))
    assert(!plainJoined.queryExecution.executedPlan.toString.contains("explode"))
  }

  test("saltedAgg: two-phase result is exactly the one-phase groupBy's") {
    import spark.implicits._
    val specs = Seq(
      Skew.SaltedAggSpec("n", "count", lit(1)),
      Skew.SaltedAggSpec("total", "sum", col("v")),
      Skew.SaltedAggSpec("lo", "min", col("v")),
      Skew.SaltedAggSpec("hi", "max", col("v")),
      Skew.SaltedAggSpec("mean", "avg", col("v")))
    val plain = skewed.groupBy(col("k")).agg(count(lit(1)).as("n"),
      sum(col("v")).as("total"), min(col("v")).as("lo"), max(col("v")).as("hi"),
      (sum(col("v")) / count(col("v"))).as("mean"))
    val salted = Skew.saltedAgg(skewed, Seq("k"), specs, factor = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // unsupported op and empty agg list refuse loudly
    assert(intercept[IllegalArgumentException] {
      Skew.saltedAgg(skewed, Seq("k"),
        Seq(Skew.SaltedAggSpec("xs", "collect_list", col("v"))))
    }.getMessage.contains("unsupported"))
  }

  test("saltedCountDistinct: value-hash salt sums to the exact distinct count") {
    import spark.implicits._
    // hot key with many duplicate values + NULL values (ignored by
    // COUNT(DISTINCT) on both paths)
    val df = ((1 to 5000).map(i => ("hot", (i % 137).toString)) ++
      (1 to 50).map(i => (s"k$i", i.toString)) ++
      Seq(("hot", null: String), ("k1", null: String))).toDF("k", "v")
    val plain = df.groupBy(col("k")).agg(count_distinct(col("v")).as("nd"))
    val salted = Skew.saltedCountDistinct(df, Seq("k"), "v", "nd", factor = 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.filter(col("k") === "hot").collect().head.getLong(1) == 137L)
  }

  test("autoSaltedAgg: two-phase shape iff the sketch fires, rows identical") {
    import spark.implicits._
    val specs = Seq(
      Skew.SaltedAggSpec("n", "count", lit(1)),
      Skew.SaltedAggSpec("total", "sum", col("v")))
    val (hotAgg, hotStats, hotSalted) = Skew.autoSaltedAgg(skewed, "k", specs)
    assert(hotSalted, s"hot bag must trigger the two-phase plan: $hotStats")
    val uniform = (1 to 5000).map(i => (s"k$i", i.toLong)).toDF("k", "v")
    val (plainAgg, plainStats, plainSalted) = Skew.autoSaltedAgg(uniform, "k", specs)
    assert(!plainSalted, s"uniform keys must aggregate plain: $plainStats")
    // the decision is visible in the plan: only the salted path carries
    // the __salt grouping (and with it the second aggregate exchange)
    assert(hotAgg.queryExecution.executedPlan.toString.contains("__salt"))
    assert(!plainAgg.queryExecution.executedPlan.toString.contains("__salt"))
    // rows identical either way
    val plainHot = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
    assert(hotAgg.exceptAll(plainHot).isEmpty && plainHot.exceptAll(hotAgg).isEmpty)
  }

  test("keyHistogram surfaces the hot key first") {
    val top = Skew.keyHistogram(skewed, Seq("k"), 3).collect()
    assert(top.head.getString(0) == "hot" && top.head.getLong(1) == 10000L)
  }
}
