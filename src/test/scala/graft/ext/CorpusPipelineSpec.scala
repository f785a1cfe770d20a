package graft.ext

import graft.{SparkSpec, Tables => T}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The sink-parameterized corpus flow (VERDICT r7 item 5): the
  * production path writes chunks WHILE the shared dedup front is
  * persisted and caches nothing itself — asserted by cache accounting
  * around the run, not by reading the code. Runs at the sf0.01 gate
  * scale like the declared capstones. */
class CorpusPipelineSpec extends SparkSpec {

  private def cachedRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("prepareAndWrite: chunks land in the sink; no cache survives; output never cached") {
    val docs = T.documents(spark, "/root/testdata/sf0.01")
    val out = Files.createTempDirectory("graft_corpus_out").toString + "/chunks"
    val before = cachedRddIds

    // the chunk frame itself must not be cache-backed: the biggest frame
    // in the flow belongs in the sink, not executor storage
    val p = CorpusPipeline.prepare(docs)
    assert(p.chunks.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    p.unpersistAll()

    val res = CorpusPipeline.prepareAndWrite(docs, out)
    assert(res.chunksWritten > 0)
    val written = spark.read.parquet(out)
    assert(written.count() == res.chunksWritten)
    assert(written.columns.toSet ==
      Set("doc_id", "chunk_id", "n_tokens", "chunk_text"))

    // every pipeline cache entry (candidates/confirmed/clusters front)
    // was released after the write action — nothing survives the run
    val leaked = cachedRddIds -- before
    assert(leaked.isEmpty, s"cache entries leaked past the run: $leaked")

    // content parity with the declared e38 flow (same geometry): the
    // sink path writes exactly what the hash-checked capstone declares
    val declared = CorpusPipeline.prepare(docs)
    val diff = written.unionAll(declared.chunks).groupBy("doc_id", "chunk_id")
      .count().filter(col("count") =!= 2).count()
    declared.unpersistAll()
    assert(diff == 0, s"$diff (doc_id, chunk_id) rows differ between sink and declared flow")
  }

  test("prepareAndWrite --shards: sharded sink holds the same chunks, doc-cohesive") {
    val docs = T.documents(spark, "/root/testdata/sf0.01")
    val flat = Files.createTempDirectory("graft_corpus_flat").toString + "/chunks"
    val shrd = Files.createTempDirectory("graft_corpus_shrd").toString + "/chunks"
    val before = cachedRddIds
    val a = CorpusPipeline.prepareAndWrite(docs, flat)
    val b = CorpusPipeline.prepareAndWrite(docs, shrd, shards = Some(4))
    assert(a.chunksWritten == b.chunksWritten, "sharding must not change content")
    assert((cachedRddIds -- before).isEmpty, "no cache survives the sharded run")

    val sharded = spark.read.parquet(shrd)
    // same (doc, chunk) set as the flat sink
    val diff = sharded.select("doc_id", "chunk_id")
      .unionAll(spark.read.parquet(flat).select("doc_id", "chunk_id"))
      .groupBy("doc_id", "chunk_id").count().filter(col("count") =!= 2).count()
    assert(diff == 0, s"$diff chunk rows differ between flat and sharded sinks")
    // doc cohesion: every chunk of a document lands in ONE shard
    val split = sharded.groupBy("doc_id")
      .agg(countDistinct(col("shard")).as("n_shards"))
      .filter(col("n_shards") > 1).count()
    assert(split == 0, s"$split documents split across shards")
  }

  test("writeSharded: shard dirs partition the corpus exactly as the e42 contract") {
    val docs = T.documents(spark, "/root/testdata/sf0.01")
    val out = Files.createTempDirectory("graft_shard_out").toString + "/shards"
    val res = CorpusPipeline.writeSharded(docs, out, nShards = 4)
    assert(res.chunksWritten == docs.count(), "every row placed exactly once")

    val back = spark.read.parquet(out)
    assert(back.count() == res.chunksWritten)
    // the partition column materializes the placement; it must equal the
    // declared rank flavor's shard assignment row for row
    val expected = Sampling.shardAssign(docs, "doc_id", nShards = 4)
      .select(col("doc_id"), col("shard").as("expected_shard"))
    val mism = back.select(col("doc_id"), col("shard"))
      .join(expected, "doc_id")
      .filter(col("shard") =!= col("expected_shard")).count()
    assert(mism == 0, s"$mism rows landed in a different shard than e42 assigns")
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == (0 until 4).map(i => s"shard=$i").toSet, s"got $dirs")
  }
}
