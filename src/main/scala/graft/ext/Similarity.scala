package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (SURVEY §2.5 E3).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *    query set against the corpus; one pass, no corpus shuffle. The
  *    correctness baseline, O(|Q|·N·dim).
  *  - [[lshTopK]]: random-hyperplane LSH — each vector maps to a small
  *    integer bucket (sign pattern of `planes` fixed hyperplanes); the
  *    join runs per-bucket (optionally ± hamming-1 probes), so at 100 TB
  *    the candidate set per query is a tiny slice of the corpus. Recall
  *    is tunable via planes/probes; verified against brute force in the
  *    test suite.
  *
  * All arithmetic via codegen'd higher-order functions: per-element
  * f32→f64 cast is exact, accumulation is left-to-right in f64, so
  * results are bit-deterministic and engine-independent.
  */
object Similarity {

  /** Exact f64 dot product of two float-array columns — higher-order-
    * function formulation (kept as the declared C29 semantics; see
    * [[fastDot]] for the hot-path variant). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** Same fold, as the codegen'd native expression
    * [[graft.functions.DotProductF32]] — bit-identical result, ~10×
    * faster inside pair joins. Requires [[graft.functions.GraftFunctions
    * .register]] (the ops below self-register on their input's session). */
  def fastDot(a: Column, b: Column): Column =
    call_function("graft_dot_f32", a, b)

  def l2norm(a: Column): Column = sqrt(fastDot(a, a))

  def cosine(a: Column, b: Column): Column = fastDot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k neighbors for each query vector (self excluded).
    * The query side is broadcast — the corpus never shuffles. Norms are
    * projected once per row below the join, so each pair costs one dot
    * product, not three. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"),
      l2norm(col(vecCol)).as("qn"))
    val scored = corpus.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("cn"))
      .join(broadcast(q), col("qid") =!= col(idCol))
      .withColumn("cos", fastDot(col("qe"), col(vecCol)) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    scored
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("qid"), col(idCol), col("cos"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Deterministic random hyperplanes (fixed seed → identical plan on
    * every run/executor). */
  private[ext] def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern LSH bucket id of a vector column. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = typedLit(p)
      when(dot(planeLit, vec) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_)).as("bucket")
  }

  /** Approximate top-k via multi-table hyperplane LSH (the banding
    * construction): `tables` independent hyperplane sets, a vector lands
    * in one bucket per table, candidates are the union over tables of
    * same-bucket (± hamming-1 multi-probe) corpus rows, then exact
    * cosine ranking within candidates.
    *
    * Scale bounds (100 TB posture): the corpus is materialized once per
    * table (×L rows through the bucket join, never all-pairs); the
    * broadcast query side carries tables × (1 + planes) probe rows per
    * query vector — keep the query set small or drop `probes`. Expected
    * candidate fraction per query ≈ tables × probeCount / 2^planes. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, dim: Int = 64, tables: Int = 4, probes: Boolean = true,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val tableDefs = (0 until tables).map(t => (t, hyperplanes(planes, dim, 42L + t)))
    val c = tableDefs.map { case (t, hp) =>
      corpus.select(col(idCol), col(vecCol),
        lit(t).as("tbl"), lshBucket(col(vecCol), hp).as("bucket"))
    }.reduce(_.unionByName(_))
    val qBase = tableDefs.map { case (t, hp) =>
      queries.select(col(idCol).as("qid"), col(vecCol).as("qe"),
        lit(t).as("tbl"), lshBucket(col(vecCol), hp).as("qb"))
    }.reduce(_.unionByName(_))
    // multi-probe: the query also visits every bucket one bit-flip away
    val probeBuckets =
      if (!probes) array(col("qb"))
      else array(col("qb") +: (0 until planes).map(i => col("qb").bitwiseXOR(lit(1L << i))): _*)
    val q = qBase.select(col("qid"), col("qe"), col("tbl"), explode(probeBuckets).as("bucket"))
    val cand = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col(idCol))
      // a pair found by several tables/probes is scored once
      .dropDuplicates("qid", idCol)
    val scored = cand.withColumn("cos", cosine(col("qe"), col(vecCol)))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    scored
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("qid"), col(idCol), col("cos"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Approximate top-k via IVF (inverted file) coarse quantization —
    * the second scale geometry next to [[lshTopK]]: pick `nlist`
    * centroids deterministically from the corpus, assign every corpus
    * vector to its nearest centroid (one broadcast pass, N × nlist
    * dots), then answer each query from its `nprobe` nearest centroid
    * cells only. Candidate fraction ≈ nprobe / nlist of the corpus; at
    * 100 TB the assignment is a one-off materialized column and probes
    * touch a fixed slice per query. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val n = corpus.count()
    val step = math.max(1L, n / nlist)
    // deterministic coarse centroids: every step-th vector in id order
    val centroids = corpus
      .withColumn("__rn", row_number().over(Window.orderBy(col(idCol))) - 1)
      .filter(col("__rn") % step === 0).limit(nlist)
      .select((col("__rn") / step).cast(IntegerType).as("cid"),
        col(vecCol).as("ce"))
    val cB = broadcast(centroids)
    def nearestCells(df: DataFrame, id: Column, vec: Column, take: Int) = {
      val w = Window.partitionBy(id).orderBy(
        (fastDot(vec, col("ce")) / (l2norm(vec) * l2norm(col("ce")))).desc, col("cid"))
      df.join(cB).withColumn("__cr", row_number().over(w)).filter(col("__cr") <= take)
    }
    val assigned = nearestCells(
      corpus.select(col(idCol), col(vecCol)), col(idCol), col(vecCol), 1)
      .select(col(idCol), col(vecCol), col("cid"))
    val probes = nearestCells(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qe")), col("qid"), col("qe"), nprobe)
      .select(col("qid"), col("qe"), col("cid"))
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("qid") =!= col(idCol))
      .dropDuplicates("qid", idCol)
      .withColumn("cos", cosine(col("qe"), col(vecCol)))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col(idCol))
    scored
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col("qid"), col(idCol), col("cos"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs (cos ≥ threshold). Brute
    * variant for conformance; the LSH bucket join is the scale path.
    * Norms are projected once per side (each of the N² pairs costs one
    * dot product); the division order matches the DuckDB oracle so
    * results stay bit-equal. */
  def cosineDupPairs(
      corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val n = corpus.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("nrm"))
    val a = n.select(col(idCol).as("id1"), col(vecCol).as("e1"), col("nrm").as("n1"))
    val b = n.select(col(idCol).as("id2"), col(vecCol).as("e2"), col("nrm").as("n2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", fastDot(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }
}
