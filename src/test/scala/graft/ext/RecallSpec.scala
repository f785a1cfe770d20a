package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One regression net for every ANN tier (VERDICT r14 item 2): recall@k
  * against exact float brute-force ground truth, computed by
  * [[Similarity.recallVsBruteForce]] (the e77 measurement generalized),
  * with a pinned floor per tier at each tier's DECLARED geometry. A
  * quantization, hashing, or cell-assignment change that silently
  * degrades a tier's ranking fails here as a recall drop instead of
  * surfacing rounds later.
  *
  * Floors are pinned a small margin under the measured sf0.001 values
  * (the pipeline is deterministic — same draw, same ranking every run —
  * so any drop below the floor is a code change, not noise; the margin
  * only absorbs deliberate re-pins of the corpus fixture). The absolute
  * numbers reflect this fixture's near-random gaussian embeddings —
  * the hardest case for locality structures — so the floors are
  * regression pins, not quality claims about real corpora.
  */
class RecallSpec extends SparkSpec {
  import graft.{Tables => T}

  private lazy val embs = T.embeddings(spark, sf001).cache()
  private lazy val queries = embs.filter(col("vec_id") < 10)
  private val k = 5

  private def meanRecall(approx: DataFrame): Double = {
    val r = Similarity.recallVsBruteForce(approx, embs, queries, k)
      .agg(avg(col("recall"))).collect().head.getDouble(0)
    info(f"mean recall@$k = $r%.3f")
    r
  }

  test("IVF recall floor (e14 geometry: nlist=16 nprobe=4 lloyd=2)") {
    val r = meanRecall(Similarity.ivfTopK(embs, queries, k,
      nlist = 16, nprobe = 4, lloydIters = 2))
    assert(r >= 0.55, f"IVF recall regressed: $r%.3f < 0.55 (measured 0.580)")
  }

  test("IVF recall floor (e28 geometry: nlist=512 nprobe=8 lloyd=0)") {
    val r = meanRecall(Similarity.ivfTopK(embs, queries, k,
      nlist = 512, nprobe = 8, lloydIters = 0))
    assert(r >= 0.95, f"large-nlist IVF recall regressed: $r%.3f < 0.95 (measured 1.000)")
  }

  test("LSH recall floor (e07 geometry: planes=8 dim=64 tables=8)") {
    val r = meanRecall(Similarity.lshTopK(embs, queries, k,
      planes = 8, dim = 64, tables = 8))
    assert(r >= 0.50, f"LSH recall regressed: $r%.3f < 0.50 (measured 0.560)")
  }

  test("int8 recall floor (e22 geometry: quantized brute force)") {
    val q = Similarity.quantizeInt8(embs)
    val r = meanRecall(Similarity.bruteForceTopK(q, q.filter(col("vec_id") < 10),
      k, vecCol = "q"))
    assert(r >= 0.95, f"int8 recall regressed: $r%.3f < 0.95 (measured 1.000)")
  }

  test("int8 IVF recall floor (e34 geometry: nlist=512 nprobe=8 lloyd=0)") {
    val q = Similarity.quantizeInt8(embs)
      .select(col("vec_id"), col("q").as("embedding"))
    val r = meanRecall(Similarity.ivfTopK(q, q.filter(col("vec_id") < 10),
      k, nlist = 512, nprobe = 8, lloydIters = 0))
    assert(r >= 0.95, f"int8 IVF recall regressed: $r%.3f < 0.95 (measured 1.000)")
  }

  test("IVF-PQ recall floor (e37 geometry: nlist=64 nprobe=8 m=16 ksub=64)") {
    val r = meanRecall(Similarity.ivfPqTopK(embs, queries, k,
      nlist = 64, nprobe = 8, m = 16, ksub = 64, pqIters = 2))
    assert(r >= 0.35, f"IVF-PQ recall regressed: $r%.3f < 0.35 (measured 0.380)")
  }

  test("served-index recall floor (e47 geometry: persisted IVF-PQ, nprobe=8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_recall_idx").toString
    Similarity.buildIndex(embs, dir, nlist = 64, m = 16, ksub = 64, pqIters = 2)
    val idx = Similarity.loadIndex(spark, dir)
    val r = meanRecall(Similarity.queryIndex(idx, queries, k, nprobe = 8))
    assert(r >= 0.35, f"served-index recall regressed: $r%.3f < 0.35 (measured " +
      "0.380, identical to the in-memory ivfPqTopK arm — the frozen-model " +
      "serve contract)")
  }

  test("filtered ANN: pre-filter arm matches the per-slice brute force exactly") {
    val f = Similarity.filteredBruteTopK(embs, queries, k, "label")
    val ql = queries.select(col("vec_id").as("qid"), col("label").as("ql"))
    assert(f.join(ql, Seq("qid")).filter(col("label") =!= col("ql")).count() == 0,
      "a returned neighbor does not share its query's label")
    // one slice, re-derived independently: brute force over the
    // label-0 sub-corpus must be bit-identical (same fastDot fold)
    val slice = embs.filter(col("label") === 0)
    val manual = Similarity.bruteForceTopK(slice, slice.filter(col("vec_id") < 10), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val got = f.join(ql, Seq("qid")).filter(col("ql") === 0)
      .select(col("qid"), col("vec_id"), col("cos"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(manual.nonEmpty && got == manual)
  }

  test("filtered ANN: selectivity dispatch picks the measured arm") {
    val one = embs.filter(col("vec_id") === 4) // label 0 → ~11% of corpus
    val (rare, preRare) = Similarity.filteredTopK(embs, one, k, "label")
    assert(preRare, "single-label query must take the exact pre-filter arm")
    assert(rare.count() == k)
    val (_, preCommon) = Similarity.filteredTopK(embs, queries, k, "label")
    assert(!preCommon, "7-label query set (~70% of corpus) must take the post-filter arm")
  }

  test("filtered ANN: post-filter IVF arm recall floor vs filtered exact truth") {
    val truth = Similarity.filteredBruteTopK(embs, queries, k, "label")
      .select(col("qid"), col("vec_id"))
    val approx = Similarity.postFilterIvfTopK(embs, queries, k, "label", overfetch = 8)
    assert(approx.filter(col("rn") > k).count() == 0)
    val nTruth = truth.count()
    val hits = truth.join(approx.select(col("qid"), col("vec_id")),
      Seq("qid", "vec_id")).count()
    val r = hits.toDouble / nTruth
    info(f"filtered post-filter recall@$k = $r%.3f")
    assert(r >= 0.30, f"filtered post-filter recall regressed: $r%.3f < 0.30 (measured 0.360)")
  }
}
