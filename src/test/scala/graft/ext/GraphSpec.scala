package graft.ext

import graft.SparkSpec
import org.scalacheck.Gen

/** Integer PageRank: hand-computed fixtures, regular-graph fixpoint,
  * and reference-equality against a literal Scala loop at random edge
  * sets. */
class GraphSpec extends SparkSpec {

  /** Literal restatement of the integer recurrence. */
  private def referencePr(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var rank = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => rank(u) / deg(u) }.sum
      }
      rank = rank.keys.map(v => v -> (150000L + 850000L * in(v) / 1000000L)).toMap
    }
    rank
  }

  test("path graph a-b-c: hand-computed micro ranks after one round") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("doc1", "doc2")
    val r = Graph.integerPageRank(edges, "doc1", "doc2", iters = 1)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // ends: 150000 + 850000·(10^6 div 2) div 10^6; center: both ends' full rank
    assert(r(1L) == (575000L, 1L) && r(3L) == (575000L, 1L))
    assert(r(2L) == (1850000L, 2L))
    // total micro-mass conserved exactly on this fixture
    assert(r.values.map(_._1).sum == 3000000L)
  }

  test("regular graph: K4 reaches its integer fixpoint and stays there") {
    import spark.implicits._
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
      .toDF("doc1", "doc2")
    for (iters <- Seq(1, 3)) {
      val r = Graph.integerPageRank(k4, "doc1", "doc2", iters)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      // 10^6 div 3 truncates: every node lands on 999999 and stays
      assert(r.values.toSet == Set(999999L), s"iters=$iters: $r")
    }
  }

  test("property: equals the literal integer recurrence at random graphs") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2L, 15L)
      m <- Gen.choose(1, 25)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n), Gen.choose(0L, n)))
      iters <- Gen.choose(1, 4)
    } yield (es.filter(p => p._1 != p._2).distinct, iters)
    val seed0 = org.scalacheck.rng.Seed(29L)
    Iterator.iterate(seed0)(_.next).take(8).foreach { seed =>
      gen.apply(Gen.Parameters.default, seed).foreach { case (pairs, iters) =>
        if (pairs.nonEmpty) {
          // the operator treats the edge list as undirected and
          // de-duplicates nothing — mirror that: feed unique pairs only
          // (both orientations of one pair would double the edge)
          val canon = pairs.map(p => (p._1 min p._2, p._1 max p._2)).distinct
          val got = Graph.integerPageRank(canon.toDF("doc1", "doc2"),
              "doc1", "doc2", iters)
            .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
          assert(got == referencePr(canon, iters), s"pairs=$canon iters=$iters")
        }
      }
    }
  }

  test("plan + storage stay bounded regardless of iteration count") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc1", "doc2")
    // per-round lineage truncation: the returned plan ends at the LAST
    // round's checkpoint leaf, so its node count is a constant — NOT a
    // function of iters (chained lazily it grew by a join+agg per round)
    def planNodes(iters: Int): Int = {
      val df = Graph.integerPageRank(edges, "doc1", "doc2", iters)
      df.collect()
      df.queryExecution.optimizedPlan.collect { case p => p }.size
    }
    assert(planNodes(2) == planNodes(8))
    // and the per-round release keeps live checkpoint storage bounded
    // too: after the run, only the final round's blocks remain (they
    // back the returned frame) — not one entry per iteration
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    Graph.integerPageRank(edges, "doc1", "doc2", iters = 8).collect()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"expected ≤1 live checkpoint (the final round), got $leaked")
  }

  test("a checkpoint-backed CALLER frame survives integerPageRank intact") {
    import spark.implicits._
    // the round-1 hazard: ranks' first lineage is a plain projection
    // over the CALLER's edges frame — releasing it would walk into a
    // checkpoint-backed input (globalRowNumber / connectedComponents
    // outputs are LogicalRDD-backed) and unpersist the caller's
    // blocks, making the caller's own later actions fail
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("doc1", "doc2")
      .localCheckpoint()
    Graph.integerPageRank(edges, "doc1", "doc2", iters = 3).collect()
    assert(edges.count() == 4L,
      "the caller's checkpoint-backed frame must remain actionable")
  }

  test("star graph: the hub outranks every leaf at any iteration depth") {
    import spark.implicits._
    val star = (2L to 8L).map(l => (1L, l)).toDF("doc1", "doc2")
    val r = Graph.integerPageRank(star, "doc1", "doc2", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((2L to 8L).forall(l => r(1L) > r(l)), r.toString)
  }

  // ---------------- triangle counting ----------------

  private def triangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.triangleCounts(edges.toDF("doc1", "doc2"), "doc1", "doc2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: every node sits in 3 triangles; a star hub sits in none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(triangles(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // hub chains leaves without closing: the dedup-vs-boilerplate signal
    val star = (2L to 9L).map(l => (1L, l))
    assert(triangles(star).isEmpty)
  }

  test("mixed graph: hand-counted, degree orientation counts each triangle once") {
    // triangle {1,2,3} + pendant 4 on node 1 + disjoint triangle {5,6,7}
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (5L, 6L), (5L, 7L), (6L, 7L))
    assert(triangles(g) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("triangles: repeated and reversed input pairs do not double-count") {
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val noisy = base ++ Seq((2L, 1L), (3L, 1L), (1L, 2L), (3L, 2L))
    assert(triangles(noisy) == triangles(base))
    assert(triangles(base ++ Seq((2L, 2L))) == triangles(base)) // self-loop dropped
  }

  test("triangle property: matches the brute triple enumeration at random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 12
      val edges = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      val es = edges.toSet
      val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong; c <- (b + 1) to n.toLong
        if es((a, b)) && es((b, c)) && es((a, c))
      } { brute(a) += 1; brute(b) += 1; brute(c) += 1 }
      assert(triangles(edges) == brute.toMap, s"edges=$edges")
    }
  }
}
