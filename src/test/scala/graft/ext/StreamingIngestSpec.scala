package graft.ext

import graft.SparkSpec
import graft.streaming.ExactlyOnce
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming ingest × persisted dedup index composition (e54):
  * per-batch protocol idempotence under every crash window, and the
  * end-to-end stream equaling the same batches ingested by hand. The
  * load-bearing property: a replayed batch re-derives its verdicts
  * against the index AS IT WAS (beforeBatch), so an admission committed
  * by a crashed attempt can neither double-admit nor make the replayed
  * doc match itself. */
class StreamingIngestSpec extends SparkSpec {

  private def doc(i: Long, salt: String = ""): (Long, String) =
    (i, s"distinct corpus prose number $i about topic ${i * 7} $salt with " +
      "enough words to shingle meaningfully at width three")

  // batch docs that must come back `new`: no shared template with the
  // corpus docs (or each other) — template overlap reads as `near`
  private val novelA = "glacier hydrology and the slow carving of valleys " +
    "by ice over millennia with moraines and eskers left behind"
  private val novelB = "harvest festivals in the northern provinces where " +
    "paper lanterns drift over the village square at dusk each autumn"

  private def fsOf(p: HPath) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def verdictRows(dir: String): Seq[(Long, String, Long)] =
    ExactlyOnce.readCommitted(spark, dir)
      .select(col("doc_id"), col("verdict"), col("match_doc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted

  private def mkIndex(tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft_sing_$tag").toString
    Dedup.buildDedupIndex(
      (0L until 4L).map(doc(_)).toDF("doc_id", "text"), "doc_id", "text", dir)
    dir
  }

  test("replay after index-append committed: same verdicts, no double admission, no self-match") {
    import spark.implicits._
    val dir = mkIndex("w2")
    val sink = java.nio.file.Files.createTempDirectory("graft_sing_w2s").toString + "/v"
    val dupOfCorpus = (11L, doc(2L)._2) // exact copy of corpus doc 2
    val b0 = Seq((10L, novelA), dupOfCorpus).toDF("doc_id", "text")
    // what batch 0 must produce, derived against the pre-batch index
    val expected = Dedup.incrementalDedup(b0, "doc_id", "text",
        Dedup.loadDedupIndex(spark, dir, beforeBatch = Some(0L),
          lineage = sink), minEstSim = 0.4)
      .select(col("doc_id"), col("verdict"), col("match_doc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(expected.map(_._2).sorted == Seq("exact", "new"))

    // CRASH WINDOW: the admission committed, the verdict commit did not —
    // run only the append half of the protocol, exactly as ingestBatch does
    val admitted = b0.filter(col("doc_id") === 10L)
    // exactly what ingestBatch's append half does: lineage = the sink
    Dedup.appendToDedupIndex(admitted, "doc_id", "text", dir,
      asStreamBatch = Some(0L), lineage = sink)
    val anchor = new HPath(s"$dir/appends")
    val fs = fsOf(anchor)
    assert(ExactlyOnce.lastCommitted(fs, anchor).contains(0L))

    // REPLAY of batch 0: must not see its own generation (doc 10 would
    // match itself as 'exact'), must not stage a second admission
    CorpusPipeline.ingestBatch(b0, 0L, "doc_id", "text", dir, sink)
    assert(verdictRows(sink) == expected,
      "replayed verdicts must re-derive against the pre-append index state")
    assert(ExactlyOnce.committedDirs(fs, anchor).size == 1, "admitted exactly once")
    assert(Dedup.loadDedupIndex(spark, dir).fingerprints.count() == 5)

    // REPLAY of a fully committed batch (crash after the verdict commit,
    // before the stream's checkpoint): a complete no-op
    CorpusPipeline.ingestBatch(b0, 0L, "doc_id", "text", dir, sink)
    assert(verdictRows(sink) == expected)
    assert(ExactlyOnce.committedDirs(fs, anchor).size == 1)

    // batches chain: batch 1 sees batch 0's admission as corpus
    val b1 = Seq((20L, novelA)).toDF("doc_id", "text")
    CorpusPipeline.ingestBatch(b1, 1L, "doc_id", "text", dir, sink)
    assert(verdictRows(sink).contains((20L, "exact", 10L)),
      s"batch-0 admission must serve batch 1: ${verdictRows(sink)}")
  }

  test("end-to-end stream equals the same batches ingested by hand") {
    import spark.implicits._
    val s = graft.streaming.StateBackend.isolatedStreamSession(spark)
    val ingest = Seq(
      (10L, novelA), (11L, novelA), // intra-batch dup pair
      (20L, novelB), (21L, doc(0L)._2)) // novel + corpus dup
      .toDF("doc_id", "text")
    // slice 0: ids < 20; slice 1: the rest — one file each, mtimes pinned
    val staging = java.nio.file.Files.createTempDirectory("graft_sing_e2e").toString
    val fs = fsOf(new HPath(staging))
    for ((pred, g) <- Seq((col("doc_id") < 20L, 0), (col("doc_id") >= 20L, 1))) {
      val p = s"$staging/slice$g"
      ingest.filter(pred).coalesce(1).write.mode("overwrite").parquet(p)
      fs.listStatus(new HPath(p))
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
        .foreach(st => fs.setTimes(st.getPath, 1700000000000L + g * 60000L, -1))
    }
    val streamedIdx = mkIndex("e2es")
    val handIdx = mkIndex("e2eh")
    val streamedSink = java.nio.file.Files.createTempDirectory("graft_sing_ss").toString + "/v"
    val handSink = java.nio.file.Files.createTempDirectory("graft_sing_hs").toString + "/v"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sing_ck").toString
    val sch = s.read.parquet(s"$staging/slice0").schema
    val src = s.readStream.schema(sch).option("maxFilesPerTrigger", 1)
      .parquet(s"$staging/slice*")
    CorpusPipeline.streamingDedupIngest(src, "doc_id", "text",
      streamedIdx, streamedSink, ckpt).awaitTermination()
    // the batch-bounded AQE-off applies to the STREAM's cloned session
    // only — the caller's session (which runs corpus-sized builds)
    // must keep adaptive execution
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true",
      "ingest-loop AQE scoping leaked into the caller's session")
    CorpusPipeline.ingestBatch(ingest.filter(col("doc_id") < 20L), 0L,
      "doc_id", "text", handIdx, handSink)
    CorpusPipeline.ingestBatch(ingest.filter(col("doc_id") >= 20L), 1L,
      "doc_id", "text", handIdx, handSink)
    val streamed = verdictRows(streamedSink)
    assert(streamed == verdictRows(handSink),
      "the stream must be exactly the hand-run batch sequence")
    assert(streamed.map(t => (t._1, t._2)).sorted == Seq(
      (10L, "new"), (11L, "exact"), (20L, "new"), (21L, "exact")).sorted,
      s"verdicts: $streamed")
    // both indexes admitted the same docs
    assert(Dedup.loadDedupIndex(spark, streamedIdx).fingerprints.count() ==
      Dedup.loadDedupIndex(spark, handIdx).fingerprints.count())
  }

  test("daily re-run: same checkpoint resumes past a compaction, new files only") {
    import spark.implicits._
    val s = graft.streaming.StateBackend.isolatedStreamSession(spark)
    val staging = java.nio.file.Files.createTempDirectory("graft_sing_daily").toString
    val fs = fsOf(new HPath(staging))
    def stage(g: Int, rows: Seq[(Long, String)]): Unit = {
      val p = s"$staging/slice$g"
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(p)
      fs.listStatus(new HPath(p))
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
        .foreach(st => fs.setTimes(st.getPath, 1700000000000L + g * 60000L, -1))
    }
    stage(0, Seq((10L, novelA)))
    val dir = mkIndex("daily")
    val sink = java.nio.file.Files.createTempDirectory("graft_sing_ds").toString + "/v"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sing_dc").toString
    val sch = s.read.parquet(s"$staging/slice0").schema
    def run(): Unit =
      CorpusPipeline.streamingDedupIngest(
        s.readStream.schema(sch).option("maxFilesPerTrigger", 1)
          .parquet(s"$staging/slice*"),
        "doc_id", "text", dir, sink, ckpt).awaitTermination()
    run() // day 1: batch 0 admits doc 10
    assert(verdictRows(sink) == Seq((10L, "new", -1L)))
    assert(Dedup.loadDedupIndex(spark, dir).fingerprints.count() == 5)
    // nightly maintenance between runs: fold + reclaim (watermarks carry)
    Dedup.compactDedupIndex(spark, dir)
    Dedup.vacuumDedupIndex(spark, dir)
    // day 2: one new file arrives; the SAME checkpoint resumes — only
    // the new file forms a batch, and its id continues the lineage
    stage(1, Seq((20L, novelA), (21L, novelB)))
    run()
    assert(verdictRows(sink) == Seq(
      (10L, "new", -1L), (20L, "exact", 10L), (21L, "new", -1L)),
      s"day-2 batch must dedup against day-1's admission: ${verdictRows(sink)}")
    assert(Dedup.loadDedupIndex(spark, dir).fingerprints.count() == 6)
    // day 3: nothing new — the drain is a no-op, nothing double-admits
    run()
    assert(verdictRows(sink).size == 3)
    assert(Dedup.loadDedupIndex(spark, dir).fingerprints.count() == 6)
  }
}
