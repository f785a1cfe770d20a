package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA over embeddings: exactness of the moment reduce (partitioning-
  * independence is the load-bearing scale property), eigensolve sanity
  * (orthogonality, variance ordering, residual), and projection
  * equivalence with a driver-side replay. */
class PcaSpec extends SparkSpec {
  private val dim = 64
  private def emb = graft.Tables.embeddings(spark, sf001)

  test("moments: exact and partitioning-independent") {
    val m1 = Pca.moments(emb.repartition(1), "embedding", dim)
    val m7 = Pca.moments(emb.repartition(7, col("vec_id")), "embedding", dim)
    assert(m1.n == m7.n && m1.n > 0)
    assert(m1.sums.sameElements(m7.sums))
    assert(m1.gram.map(_.toSeq).toSeq == m7.gram.map(_.toSeq).toSeq)
    // brute-force replay on the driver over the same quantization
    val rows = emb.select(Pca.quantizeMicros(col("embedding"))).collect()
      .map(_.getSeq[Long](0).toArray)
    assert(m1.n == rows.length)
    val s = new Array[Long](dim)
    val g = Array.ofDim[Long](dim, dim)
    rows.foreach { q =>
      var i = 0
      while (i < dim) {
        s(i) += q(i)
        var j = 0
        while (j < dim) { g(i)(j) += q(i) * q(j); j += 1 }
        i += 1
      }
    }
    assert(m1.sums.sameElements(s))
    assert(m1.gram.map(_.toSeq).toSeq == g.map(_.toSeq).toSeq)
  }

  test("fit: top-2 eigenpairs are unit, near-orthogonal, variance-ordered") {
    val mo = Pca.fit(emb, "embedding", dim)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(mo.v1, mo.v1) - 1.0) < 1e-12)
    assert(math.abs(dot(mo.v2, mo.v2) - 1.0) < 1e-12)
    // fixed 60-step iteration is a determinism contract, not a
    // convergence guarantee — orthogonality is approximate when the
    // λ2/λ3 gap is small (sanity bound, not bit contract)
    assert(math.abs(dot(mo.v1, mo.v2)) < 0.01)
    assert(mo.lam1 > 0 && mo.lam2 > 0 && mo.lam1 >= mo.lam2)
    // sign convention: largest-|x| component is positive
    def maxComp(v: Array[Double]) = v(v.map(math.abs).zipWithIndex.maxBy(_._1)._2)
    assert(maxComp(mo.v1) > 0 && maxComp(mo.v2) > 0)
  }

  test("project: distributed scores equal a driver-side replay; pc1 variance >= pc2") {
    val model = Pca.fit(emb, "embedding", dim)
    val got = Pca.project(emb, "embedding", model)
      .select(col("vec_id"), col("pc1_q"), col("pc2_q"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val qs = emb.select(col("vec_id"), Pca.quantizeMicros(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    qs.foreach { case (id, q) =>
      var p1 = 0.0; var p2 = 0.0; var j = 0
      while (j < dim) {
        val c = q(j).toDouble - model.mean(j)
        p1 += c * model.v1(j); p2 += c * model.v2(j); j += 1
      }
      assert(got(id) == ((p1, p2)), s"vec $id") // bit-equal, not approx
    }
    def variance(xs: Iterable[Double]) = {
      val n = xs.size.toDouble
      val m = xs.sum / n
      xs.map(x => (x - m) * (x - m)).sum / n
    }
    assert(variance(got.values.map(_._1)) >= variance(got.values.map(_._2)))
  }

  test("applyMomentsFeed: maintained moments equal recomputed, bit-for-bit") {
    import graft.etl.Cdc
    val before = emb.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    val after = emb.filter(col("vec_id") % 7 =!= 0)
      .select(col("vec_id"),
        when(col("vec_id") % 11 === 0,
          transform(col("embedding"), x => x.cast("double") + lit(0.25)))
          .otherwise(transform(col("embedding"), x => x.cast("double"))).as("vec"))
    val feed = Cdc.snapshotDiffFull(before, after, Seq("vec_id"))
    assert(feed.filter(col("op") === "I").count() > 0)
    assert(feed.filter(col("op") === "D").count() > 0)
    assert(feed.filter(col("op") === "U").count() > 0)
    val maintained = Pca.applyMomentsFeed(Pca.moments(before, "vec", dim), feed, "vec", dim)
    val recomputed = Pca.moments(after, "vec", dim)
    assert(maintained.n == recomputed.n)
    assert(maintained.sums.sameElements(recomputed.sums))
    assert(maintained.gram.map(_.toSeq).toSeq == recomputed.gram.map(_.toSeq).toSeq)
  }

  test("applyMomentsFeed: empty feed is the identity; malformed feeds fail loudly") {
    import spark.implicits._
    val m0 = Pca.moments(emb.limit(10), "embedding", dim)
    val cols = Seq("op", "vec", "vec_before")
    val empty = Seq.empty[(String, Array[Double], Array[Double])].toDF(cols: _*)
    val same = Pca.applyMomentsFeed(m0, empty, "vec", dim)
    assert(same.n == m0.n && same.sums.sameElements(m0.sums))
    // missing before-image column
    val noBefore = Seq(("I", Array.fill(dim)(0.0))).toDF("op", "vec")
    val e1 = intercept[IllegalArgumentException] {
      Pca.applyMomentsFeed(m0, noBefore, "vec", dim)
    }
    assert(e1.getMessage.contains("vec_before"))
    // unknown op code fails at exec time, not silently double-counted
    val badOp = Seq(("c", Array.fill(dim)(0.0), Array.fill(dim)(0.0))).toDF(cols: _*)
    val e2 = intercept[Exception] {
      Pca.applyMomentsFeed(m0, badOp, "vec", dim)
    }
    assert(e2.getMessage.contains("unknown op code") ||
      Option(e2.getCause).exists(_.getMessage.contains("unknown op code")))
  }

  test("versioned moment state: table round-trips and batch replay is idempotent") {
    import graft.etl.Cdc
    def assertSame(a: Pca.Moments, b: Pca.Moments): Unit = {
      assert(a.n == b.n)
      assert(a.sums.sameElements(b.sums))
      assert(a.gram.map(_.toSeq).toSeq == b.gram.map(_.toSeq).toSeq)
    }
    // (1) the persisted-state representation is lossless: moments →
    // table → parquet → table → moments, bit-for-bit
    val before = emb.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    val m0 = Pca.moments(before, "vec", dim)
    val root = java.nio.file.Files.createTempDirectory("graft_pca_state").toString
    Pca.momentTable(spark, m0).write.mode("overwrite").parquet(s"$root/v0")
    assertSame(m0, Pca.momentsFromTable(spark.read.parquet(s"$root/v0"), dim))
    // (2) crash-replay: the streaming maintainer derives v{id+1} from
    // v{id} and OVERWRITES — re-delivering the same batch after a
    // crash recomputes the same v1 from the untouched v0 instead of
    // double-counting the feed into it
    val after = emb.filter(col("vec_id") % 7 =!= 0)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    val feed = Cdc.snapshotDiffFull(before, after, Seq("vec_id"))
    def applyBatch(): Pca.Moments = {
      val next = Pca.applyMomentsFeed(
        Pca.momentsFromTable(spark.read.parquet(s"$root/v0"), dim), feed, "vec", dim)
      Pca.momentTable(spark, next).write.mode("overwrite").parquet(s"$root/v1")
      Pca.momentsFromTable(spark.read.parquet(s"$root/v1"), dim)
    }
    val first = applyBatch()
    val replayed = applyBatch() // same batch id, same input version
    assertSame(first, replayed)
    assertSame(first, Pca.moments(after, "vec", dim)) // and both ≡ recompute
  }

  test("projection plan: map-only, no exchange") {
    val model = Pca.fit(emb, "embedding", dim)
    val plan = Pca.project(emb, "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }
}
