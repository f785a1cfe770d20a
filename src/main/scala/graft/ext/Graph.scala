package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph scoring over document-similarity graphs — integer-exact
  * PageRank for importance propagation on the near-dup graph (pick the
  * canonical/most-connected representative of a duplicate family, rank
  * boilerplate hubs) — the score-propagation companion to the
  * connected-components operator ([[Dedup.connectedComponents]]).
  *
  * Why integer micro-units: distributed double summation is
  * reorder-sensitive, so a float PageRank is not restatable by an
  * independent engine. Here ranks live in micro-units (1.0 = 1,000,000)
  * and every step is BIGINT arithmetic — `rank div deg` per edge,
  * `(damp · Σcontrib) div 10^6` per node — associative and
  * bit-identical in any engine. Same discipline as the integer-exact
  * BM25/RRF scoring (e61/e63).
  *
  * Overflow bound: total micro-mass is conserved (≤ n·10^6), so a
  * node's contribution sum is ≤ n·10^6 and the damp multiply stays in
  * int64 while `n ≤ Long.Max / (damp · 10^6)` (~10^7 nodes at
  * damp 0.85). Past that a hub's multiply could wrap SILENTLY under
  * non-ANSI semantics — so the iteration raises a loud error the
  * moment any contribution sum crosses the safe line instead of
  * emitting garbage ranks; rescale the unit (e.g. damp in per-mille)
  * to go bigger.
  *
  * Scale shape: each iteration is one broadcast-or-shuffle hash join
  * (ranks ⋈ edges on the source node) plus one hash aggregation by the
  * destination — the Pregel message-passing step expressed as Catalyst
  * relational ops, `iters` bounded. The adjacency subtree is identical
  * across iterations, so the per-iteration exchanges are planner-
  * reusable; at 100 TB you'd persist the degree-joined adjacency once
  * and pre-partition both sides by node id (the
  * [[graft.etl.Bucketing]] co-location discipline).
  */
object Graph {

  private val OneMicro = 1000000L

  /** Fixed-iteration integer PageRank over an UNDIRECTED edge list
    * (each input pair contributes both directions). Nodes are the
    * edge endpoints; every node starts at 1.0 (= 10^6 micro) and
    * after each round holds
    * `base + (damp · Σ_{u→v} (rank_u div deg_u)) div 10^6` with
    * `base = 10^6 − damp`. Returns (node, rank_micro, deg), one row
    * per graph node. */
  def integerPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampMicro: Long = 850000L): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of range [1, 20]: $iters")
    require(dampMicro >= 0L && dampMicro <= OneMicro, s"damp out of range: $dampMicro")
    val sym = edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .union(edges.select(col(dstCol).cast("long").as("u"), col(srcCol).cast("long").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // the adjacency is re-probed every round — persist it once instead
    // of re-running the scan + degree aggregate per iteration (the
    // "persist the degree-joined adjacency" discipline from the
    // scaladoc, applied); released deterministically before return
    val adj = sym.join(deg, "u").persist() // (u, v, deg)
    val base = OneMicro - dampMicro
    var ranks = deg.select(col("u").as("node"), lit(OneMicro).as("rank_micro"))
    for (round <- 1 to iters) {
      // the graph is symmetric, so every node has >= 1 in-edge and the
      // inner join/aggregate keeps the node set invariant across rounds
      val damped =
        if (dampMicro == 0L) lit(0L)
        else when(col("s") > lit(Long.MaxValue / dampMicro),
          raise_error(concat(
            lit("integerPageRank: damp*contribution overflows int64 at sum="),
            col("s").cast("string"))).cast("long"))
          .otherwise(expr(s"($dampMicro * s) div $OneMicro"))
      val next = adj.join(ranks, adj("u") === ranks("node"))
        .select(col("v"), expr("rank_micro div deg").as("contrib"))
        .groupBy(col("v"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("v").as("node"), (lit(base) + damped).as("rank_micro"))
        // per-round lineage TRUNCATION (the connectedComponents
        // discipline, Dedup.scala): chained lazily each round nests
        // another join+aggregate onto the plan, so plan depth — and
        // AQE's per-update restringification cost — grows ∝ iters (up
        // to the allowed 20). One eager localCheckpoint per round
        // keeps both the plan and any re-execution one round deep;
        // exact Long arithmetic makes the result independent of where
        // the cut lands
        .localCheckpoint()
      // the new round is a self-contained leaf now — release the
      // previous round's checkpoint blocks deterministically instead
      // of waiting on the ContextCleaner. ONLY from round 2: round 1's
      // `ranks` is a plain projection over the CALLER's edges frame,
      // and releaseLineage walks transitive RDD deps — if the caller's
      // input is checkpoint/persist-backed (globalRowNumber or
      // connectedComponents output, both LogicalRDD-backed here), the
      // walk would unpersist the CALLER's blocks, and a released local
      // checkpoint cannot recompute. Rounds ≥ 2 release only the
      // previous round's own localCheckpoint leaf (lineage truncated,
      // so the walk cannot escape this function's frames).
      if (round > 1) Checkpoints.releaseLineage(ranks)
      ranks = next
    }
    val out = ranks.join(deg, ranks("node") === deg("u"))
      .select(col("node"), col("rank_micro"), col("deg"))
    adj.unpersist(blocking = false)
    // the LAST round's checkpoint backs `out` — the caller's actions
    // read its blocks; the ContextCleaner reclaims them when the frame
    // goes unreferenced (or use [[Checkpoints.releaseLineage]] after
    // the final action), same contract as connectedComponents
    out
  }

  /** Exact TRIANGLE COUNT per node over an undirected edge list — the
    * cluster-density diagnostic for near-dup graphs (a duplicate
    * family is near-clique: high triangle counts; a boilerplate hub
    * chains documents WITHOUT triangles — the two look identical by
    * degree alone). Node-iterator with DEGREE ORIENTATION (Schank &
    * Wagner): orient every edge from the lower-(degree, id) endpoint
    * to the higher, so each triangle is counted exactly once at its
    * lowest-ranked vertex and — the scale property — wedge
    * enumeration is `Σ d_out(v)²` with `d_out` bounded by O(√m) for
    * ANY degree distribution. The naive undirected wedge join
    * explodes as `Σ d(v)²` on hubs; orientation is the difference
    * between a boilerplate hub costing deg² and costing nothing.
    *
    * Shape: degree aggregate → two joins of the oriented list with
    * itself (wedge build on the low vertex, closure probe on the
    * (b, c) pair) → per-node count rollup crediting all three
    * corners. All exchanges carry (long, long) pairs.
    *
    * Input pairs must be unique undirected edges (a < b, no
    * self-loops — the near-dup pair operators emit exactly this).
    * Returns (node, triangles), one row per node WITH ≥1 triangle. */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // normalize + dedup defensively: a repeated or reversed input pair
    // would otherwise double-count every wedge it closes; the pair
    // operators emit unique a<b edges, so the distinct is a no-op
    // exchange-wise there (same key as the degree aggregate)
    val e = edges.select(
      least(col(aCol).cast("long"), col(bCol).cast("long")).as("a"),
      greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient: lower (degree, id) endpoint -> higher
    val withDeg = e
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), Seq("a"))
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), Seq("b"))
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("dst"))
    // wedges at the low vertex: src -> (dst1, dst2), dst1 < dst2
    val w1 = oriented.select(col("src"), col("dst").as("x"))
    val w2 = oriented.select(col("src"), col("dst").as("y"))
    val wedges = w1.join(w2, Seq("src")).filter(col("x") < col("y"))
    // closure probe: is {x, y} an edge? Probed against the UNDIRECTED
    // set — deliberately. The textbook oriented-closure probe (order
    // the wedge legs by the (degree, id) orientation order and probe
    // the oriented list directly) was built and MEASURED (round 18):
    // it saves nothing — both forms plan 8 shuffle exchanges, because
    // ReuseExchange already serves this probe from e's distinct
    // exchange (und is a projection of e) — and it costs more, because
    // the probe side then carries the degree-join subtree instead of a
    // reused projection (5 sort-merge joins / 93 plan nodes vs 4 / 83
    // here). x < y holds by construction, so the undirected probe is
    // (x, y) directly; each triangle still closes exactly once.
    val und = e.select(least(col("a"), col("b")).as("u1"),
      greatest(col("a"), col("b")).as("u2"))
    val tris = wedges
      .join(und, col("x") === col("u1") && col("y") === col("u2"))
      .select(col("src"), col("x"), col("y"))
    // credit each corner
    tris.select(explode(array(col("src"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }
}
