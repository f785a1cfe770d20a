package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality._

  private def facts: DataFrame = Seq(
    (Some(1L), Some(5.0), "A"),
    (Some(1L), Some(55.0), "A"),  // range violation (and dup key with row 1)
    (Some(2L), None, "X"),        // set violation; null qty ignored by range
    (None, Some(10.0), "N")       // null-key violation; FK check skips it
  ).toDF("k", "qty", "flag")

  test("rowAudit: null / range / set checks count in one pass") {
    val out = rowAudit(facts, Seq(
      notNull("k"),
      inRange("qty", 0, 50),
      inSet("flag", Seq("A", "N"))))
      .orderBy("check_name")
      .select("check_name", "violations", "total")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("in_range:qty", 1L, 4L),
      ("in_set:flag", 1L, 4L),
      ("not_null:k", 1L, 4L)))
    // one pass: a single Aggregate over a single scan — no join, no union
    val plan = rowAudit(facts, Seq(notNull("k"), inRange("qty", 0, 50)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"))
  }

  test("uniqueAudit: counts rows beyond the first per key") {
    val df = Seq((1L, 1), (1L, 1), (1L, 2), (2L, 1)).toDF("a", "b")
    val out = uniqueAudit(df, Seq("a", "b"))
      .select("check_name", "violations", "total")
      .as[(String, Long, Long)].collect().head
    assert(out === (("unique:a,b", 1L, 4L)))
  }

  test("rowAudit: check names with quotes/backslashes are data, not SQL") {
    val out = rowAudit(facts, Seq(
      RowCheck("it's a 'quoted' name", $"k".isNull),
      RowCheck("""back\slash, comma""", $"qty".isNull)))
      .orderBy("check_name")
      .select("check_name", "violations")
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(
      ("""back\slash, comma""", 1L),
      ("it's a 'quoted' name", 1L)))
  }

  test("uniqueAudit: NULL key fields compare equal, unique NULL rows are NOT violations") {
    // (null,1) appears once → unique; (null,2) twice → 1 violation;
    // a bare multi-col count_distinct would drop all four NULL tuples
    // from the distinct count and report 3 violations instead of 1
    val df = Seq(
      (None, 1), (Some(1L), 1),
      (None, 2), (None, 2)).toDF("a", "b")
    val out = uniqueAudit(df, Seq("a", "b"))
      .select("violations", "total").as[(Long, Long)].collect().head
    assert(out === ((1L, 4L)))
  }

  test("refAudit: orphans counted, NULL foreign keys excluded") {
    val dim = Seq(1L, 2L).toDF("pk")
    val out = refAudit(facts, "k", dim, "pk")
      .select("check_name", "violations", "total")
      .as[(String, Long, Long)].collect().head
    // all non-null ks (1, 2) resolve; the NULL row is not an orphan
    assert(out === (("ref:k->pk", 0L, 4L)))
    val dim2 = Seq(1L).toDF("pk")
    assert(refAudit(facts, "k", dim2, "pk")
      .select("violations").as[Long].collect().head === 1L)
  }

  test("psiDrift: hand-computed buckets, smoothing, clamping, micro quantization") {
    val before = Seq(1.0, 2.0, 7.0).toDF("v")
    val after = Seq(6.0, 8.0, 12.0).toDF("v") // 12.0 clamps into the top bucket
    val out = DataQuality.psiDrift(before, after, "v", bins = 2, lo = 0.0, hi = 10.0)
      .orderBy("bin")
      .select("bin", "n_before", "n_after", "psi_contrib_micro")
      .as[(Int, Long, Long, Long)].collect().toSeq
    def contrib(nb: Long, na: Long, tb: Long, ta: Long): Long = {
      val p = (nb + 1.0) / (tb + 2.0); val q = (na + 1.0) / (ta + 2.0)
      math.floor(((p - q) * math.log(p / q)) * 1000000.0).toLong
    }
    assert(out === Seq(
      (0, 2L, 0L, contrib(2, 0, 3, 3)),
      (1, 1L, 3L, contrib(1, 3, 3, 3))))
    // PSI of a population against itself is ~0 (all contributions 0)
    val self = DataQuality.psiDrift(before, before, "v", 4, 0.0, 10.0)
      .agg(org.apache.spark.sql.functions.sum("psi_contrib_micro"))
      .as[Long].collect().head
    assert(self === 0L)
  }

  test("report: unions audits into one name-ordered frame") {
    val rep = report(Seq(
      uniqueAudit(facts, Seq("k")),
      rowAudit(facts, Seq(notNull("k")))))
      .select("check_name").as[String].collect().toSeq
    assert(rep === Seq("not_null:k", "unique:k"))
  }

  test("corrProfile: perfect linear / anti-linear pairs, scale invariance") {
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
      (4.0, 8.0, -4.0)).toDF("x", "y", "z")
    val out = DataQuality.corrProfile(df,
      Seq(("x", 1000000.0), ("y", 1000000.0), ("z", 1000000.0)))
      .orderBy("col_a", "col_b")
      .as[(String, String, Double)].collect().toSeq
    assert(out.map(_._1).zip(out.map(_._2)) ===
      Seq(("x", "y"), ("x", "z"), ("y", "z")))
    assert(out.forall { case (_, _, c) => math.abs(math.abs(c) - 1.0) < 1e-9 })
    assert(out(0)._3 > 0 && out(1)._3 < 0 && out(2)._3 < 0)
    // correlation is invariant under a different positive per-column scale
    val other = DataQuality.corrProfile(df,
      Seq(("x", 100.0), ("y", 100.0), ("z", 100.0)))
      .orderBy("col_a", "col_b").as[(String, String, Double)].collect().toSeq
    out.zip(other).foreach { case ((_, _, a), (_, _, b)) =>
      assert(math.abs(a - b) < 1e-9)
    }
  }

  test("corrProfile: single aggregate pass, empty input fails loudly") {
    val plan = DataQuality.corrProfile(
      graft.Tables.lineitem(spark, sf001),
      Seq(("l_quantity", 100.0), ("l_discount", 1000000.0)))
    assert(plan.collect().length == 1)
    val e = intercept[IllegalArgumentException] {
      DataQuality.corrProfile(
        Seq.empty[(Double, Double)].toDF("a", "b"),
        Seq(("a", 1.0), ("b", 1.0)))
    }
    assert(e.getMessage.contains("empty input"))
  }

  test("corrProfile: overflow is LOUD — guard fires in the risk zone, ANSI on actual overflow") {
    // risk zone: one large row makes max|q_a|²·n ≥ 2^63 while this
    // run's actual sums still fit — the BigInt bound (from driver-side
    // |min|/|max|, immune to the abs(Long.MinValue) wrap) must refuse
    // with the actionable message
    val risky = Seq((-1800.0, 1.0), (0.001, 2.0), (0.002, 5.0)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      DataQuality.corrProfile(risky, Seq(("a", 1000000.0), ("b", 1000000.0)))
    }
    assert(e.getMessage.contains("can exceed int64"))
    // an input that overflows DURING the aggregate pass is loud too:
    // the session is ANSI (Spark 4 default), so the Long product/sum
    // throws rather than wrapping — either path, never silent
    val overflowing = Seq((-1e30, 1.0), (2.0, 2.0), (3.0, 5.0)).toDF("a", "b")
    intercept[Exception] {
      DataQuality.corrProfile(overflowing, Seq(("a", 1000000.0), ("b", 1000000.0)))
    }
  }
}
