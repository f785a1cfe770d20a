package graft.ext

import graft.{SparkSpec, Tables => T}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling + corpus statistics. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = T.documents(spark, sf001).cache()

  test("hash sampling is deterministic and monotone in the rate") {
    val a = Sampling.hashSample(docs, "doc_id", 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "doc_id", 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same rate must select the same rows")
    val bigger = Sampling.hashSample(docs, "doc_id", 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(bigger), "raising the rate must only add rows")
    // rate is approximately honored (hash uniformity; generous band)
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"0.2 sample selected $frac")
  }

  test("stratified sampling applies per-stratum rates") {
    val out = Sampling.stratifiedHashSample(
      docs, "doc_id", "source", Map("src0" -> 1000, "src1" -> 0), 100)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.filter(col("source") === "src0").count()
    assert(bySrc.getOrElse("src0", 0L) == total, "permille=1000 keeps every row")
    assert(!bySrc.contains("src1"), "permille=0 keeps none")
  }

  test("per-stratum cap keeps exactly cap rows, as a prefix under growth") {
    val per = Sampling.capPerStratum(docs, "doc_id", "source", cap = 3)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(per.getOrElse(src, 0L) == math.min(3L, n),
        s"$src: expected min(3, $n), got ${per.getOrElse(src, 0L)}")
    }
    val small = Sampling.capPerStratum(docs, "doc_id", "source", cap = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.capPerStratum(docs, "doc_id", "source", cap = 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "raising the cap must only add rows")
    val again = Sampling.capPerStratum(docs, "doc_id", "source", cap = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small == again, "selection must be deterministic")
  }

  test("priority sample: guaranteed heavy row, HT weights, small-pop identity") {
    import spark.implicits._
    // weights spread over orders of magnitude; doc 7 so heavy its
    // priority (≥ w) exceeds any light row's max possible w·2^24
    val df = (1L to 50L).map(i => (i, if (i == 7L) 100000000000L else 1L + i % 9))
      .toDF("doc_id", "w")
    val got = Sampling.prioritySample(df, "doc_id", "w", k = 10)
      .orderBy("doc_id").collect()
    assert(got.length == 10)
    assert(got.exists(_.getLong(0) == 7L), "a dominant weight must always be kept")
    // HT weight: never below the row's own weight, and exact for heavy rows
    got.foreach { r =>
      assert(r.getAs[Double]("est_w") >= r.getLong(1).toDouble)
    }
    assert(got.find(_.getLong(0) == 7L).get.getAs[Double]("est_w") == 1e11)
    // determinism
    val again = Sampling.prioritySample(df, "doc_id", "w", k = 10)
      .orderBy("doc_id").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // population ≤ k: everything kept, est_w collapses to the true weight
    val small = Sampling.prioritySample(df.filter($"doc_id" <= 5), "doc_id", "w", k = 10)
      .orderBy("doc_id").collect()
    assert(small.length == 5)
    small.foreach(r => assert(r.getAs[Double]("est_w") == r.getLong(1).toDouble))
  }

  test("priority sample: NULL / sub-1 weights fail loudly, not silently bias") {
    import spark.implicits._
    val zero = Seq((1L, 5L), (2L, 0L), (3L, 2L)).toDF("doc_id", "w")
    val eZero = intercept[Exception] {
      Sampling.prioritySample(zero, "doc_id", "w", k = 2).collect()
    }
    assert(eZero.getMessage.contains("prioritySample") ||
      Option(eZero.getCause).exists(_.getMessage.contains("prioritySample")),
      s"expected the weight-contract error, got: ${eZero.getMessage}")
    val withNull = Seq((1L, java.lang.Long.valueOf(5L)), (2L, null: java.lang.Long))
      .toDF("doc_id", "w")
    val eNull = intercept[Exception] {
      Sampling.prioritySample(withNull, "doc_id", "w", k = 5).collect()
    }
    assert(eNull.getMessage.contains("prioritySample") ||
      Option(eNull.getCause).exists(_.getMessage.contains("prioritySample")),
      s"expected the weight-contract error, got: ${eNull.getMessage}")
  }

  test("shard assignment is a total, deterministic, dense placement") {
    val out = Sampling.shardAssign(docs, "doc_id", nShards = 4)
      .select("doc_id", "shard", "pos").collect()
    assert(out.length == docs.count(), "every row is placed exactly once")
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    out.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 4)
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps.head == 1L && ps.last == ps.length.toLong &&
        ps.distinct.length == ps.length,
        s"shard $shard positions not dense 1..n: ${ps.take(5).mkString(",")}...")
    }
    val again = Sampling.shardAssign(docs, "doc_id", nShards = 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet,
      "placement must be identical across runs")
  }

  test("temperature mixture: rates derive from counts, caps bind, deterministic") {
    val out = Sampling.temperatureMixtureSample(docs, "doc_id", "lang",
      alpha = 0.5, budget = 250).cache()
    val taken = out.collect()
    assert(taken.nonEmpty && taken.map(_.getLong(0)).distinct.length == taken.length)
    // expected take ~ budget (hash uniformity; generous band)
    assert(taken.length > 150 && taken.length < 350,
      s"budget 250 selected ${taken.length}")
    // temperature smoothing: a low-resource stratum keeps a HIGHER
    // fraction of itself than the dominant one (the whole point)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = sizes.maxBy(_._2)._1
    val small = sizes.minBy(_._2)._1
    val fracBig = byLang.getOrElse(big, 0L).toDouble / sizes(big)
    val fracSmall = byLang.getOrElse(small, 0L).toDouble / sizes(small)
    assert(fracSmall > fracBig,
      s"low-resource $small ($fracSmall) must be up-weighted vs $big ($fracBig)")
    // budget >= corpus: every rate caps at 1, everything kept
    val all = Sampling.temperatureMixtureSample(docs, "doc_id", "lang",
      alpha = 0.5, budget = 100000)
    assert(all.count() == docs.count(), "rate cap at 1 must keep every row")
    // deterministic across runs
    val again = Sampling.temperatureMixtureSample(docs, "doc_id", "lang",
      alpha = 0.5, budget = 250).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == taken.map(_.getLong(0)).toSet)
    out.unpersist()
  }

  test("temperature mixture plan: corpus filtered map-side, no corpus exchange") {
    val out = Sampling.temperatureMixtureSample(docs, "doc_id", "lang",
      alpha = 0.5, budget = 250)
    val plan = out.queryExecution.executedPlan.toString
    // the big side joins the 5-row rate table broadcast; the only
    // exchanges sit under the tiny counts aggregate
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"rates must broadcast onto the corpus:\n$plan")
  }

  test("leakage-safe split: clusters stay together, singletons split on their own id") {
    import spark.implicits._
    val corpus = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc1", "doc2")
    val out = Sampling.leakageSafeSplit(corpus, "doc_id", pairs,
      valPermille = 300, testPermille = 300)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L), "every doc is assigned")
    // the chained pairs form ONE cluster keyed by its min id; all three
    // docs carry the same key and therefore the same split
    val clustered = out.filter(t => Seq(1L, 2L, 3L).contains(t._1))
    assert(clustered.map(_._2).distinct == Seq(1L), s"cluster key: $clustered")
    assert(clustered.map(_._3).distinct.size == 1,
      s"near-dup family split apart: $clustered")
    // singletons key on themselves
    assert(out.filter(t => t._1 >= 4L).forall(t => t._2 == t._1))
    // degenerate bands: 0/0 puts everything in train
    val allTrain = Sampling.leakageSafeSplit(corpus, "doc_id", pairs, 0, 0)
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(allTrain == Seq("train"))
    // deterministic across runs
    val again = Sampling.leakageSafeSplit(corpus, "doc_id", pairs, 300, 300)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(again == out)
  }

  test("leakage-safe split on the corpus: no near-dup pair crosses the test boundary") {
    val pairs = Dedup.minhashCandidatesPortable(docs, "doc_id", "text",
      k = 32, bands = 8, minEstSim = 0.4)
    val split = Sampling.leakageSafeSplit(docs, "doc_id", pairs, 100, 100)
    val byDoc = split.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val crossing = pairs.select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => byDoc(a) != byDoc(b) }
    assert(crossing.isEmpty,
      s"near-dup pairs crossing the split boundary: ${crossing.take(5).mkString(",")}")
    // sanity: at 10/10/80 permille over 500 docs all three splits exist
    val labels = byDoc.values.toSet
    assert(labels == Set("train", "val", "test"), s"labels seen: $labels")
  }

  test("leakage-safe split property — random pair sets never cross the boundary") {
    import org.scalacheck.Gen
    import spark.implicits._
    val seed0 = org.scalacheck.rng.Seed(37L)
    val gen = for {
      n <- Gen.choose(4, 30)
      nPairs <- Gen.choose(0, 25)
      pairs <- Gen.listOfN(nPairs,
        Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield (n, pairs.filter(p => p._1 != p._2))
    Iterator.iterate(seed0)(_.next).take(12).foreach { seed =>
      gen.apply(Gen.Parameters.default, seed).foreach { case (n, pairs) =>
        val corpus = (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
        val pairDf = pairs.toDF("doc1", "doc2")
        val split = Sampling.leakageSafeSplit(corpus, "doc_id", pairDf, 250, 250)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        assert(split.map(_._1).sorted.toSeq == (0L until n),
          "every doc assigned exactly once")
        val byDoc = split.map(t => t._1 -> t._3).toMap
        // no pair — and transitively no chain — crosses the boundary:
        // walk the union-find closure in scala and compare components
        val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
        def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
        pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
        (0L until n).groupBy(find).values.foreach { comp =>
          assert(comp.map(byDoc).toSet.size == 1,
            s"component $comp split across ${comp.map(byDoc).toSet}")
        }
        // and the split key is the component minimum (CC's rep contract)
        val keys = split.map(t => t._1 -> t._2).toMap
        (0L until n).groupBy(find).values.foreach { comp =>
          assert(comp.map(keys).toSet == Set(comp.min),
            s"component $comp keyed ${comp.map(keys).toSet}, want ${comp.min}")
        }
      }
    }
  }

  test("length stats: counts and percentile ordering per stratum") {
    val rows = Sampling.lengthStats(docs, "lang", "text").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p50 <= p90 && p90 <= p99, s"percentiles out of order: $r")
      assert(r.getLong(1) > 0 && r.getDouble(2) > 0)
    }
  }
}
