package graft.streaming

import org.apache.spark.sql.SparkSession

/** Production state backend for every Structured Streaming query in the
  * engine.
  *
  * Spark's default streaming state store is the in-memory HDFS-backed
  * provider: every key of every stateful operator (windowed aggregation,
  * watermark dedup, stream-stream join buffers, `flatMapGroupsWithState`
  * user state) lives ON-HEAP in the executor, one map per operator per
  * partition. That is fine for a demo drain and is the first OOM at
  * production event volume — a stream-stream join over the reference's
  * event firehose (reference CLAUDE.md:133 names streaming as the scale
  * TODO) buffers BOTH sides' rows within the watermark, which at 100 TB
  * is far beyond executor heap. That buffering is BOUNDED, not
  * lifetime-accumulating: [[StreamStateRetirementSpec]] measures the
  * c51-shaped join's state rows per micro-batch and proves both sides'
  * buffers retire as the opposing watermark passes the join range
  * (waves of 12 buffered rows evict to a steady-state floor below one
  * wave), so state is O(rows within the watermark horizon) — the
  * property that makes the shape runnable against an unbounded stream.
  *
  * [[https://spark.apache.org/docs/latest/streaming/structured-streaming-programming-guide.html#rocksdb-state-store-implementation
  * RocksDB state store]] (ships in the Spark 4 jars) keeps state in
  * native memory + local disk with changelog/snapshot files in the
  * checkpoint dir, so state size is bounded by disk, not heap. All four
  * streaming conformance queries (c40/c47/c50/c51) and the incremental
  * sync run on it via [[isolatedStreamSession]]; [[RocksDBStateSpec]]
  * asserts from query progress that the provider actually engaged
  * (RocksDB-specific custom metrics present), so the config can't
  * silently fall back.
  */
object StateBackend {

  /** FQCN of the RocksDB provider (resolved from the Spark 4 jars; no
    * extra dependency — rocksdbjni ships alongside spark-sql). */
  val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Set the streaming state backend confs on an existing session.
    * `providerClass` is a runtime SQL conf (SQLConf, not a static conf),
    * so per-session configuration is safe — batch queries on other
    * sessions of the same SparkContext are untouched. */
  def configure(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDBProvider)
    // bound the changelog replay on restart; snapshots every 16 deltas
    // keep recovery O(recent batches) instead of O(stream lifetime)
    s.conf.set("spark.sql.streaming.stateStore.minDeltasForSnapshot", "16")
    // changelog checkpointing (r21): commit uploads the batch's CHANGES
    // to the checkpoint instead of a full RocksDB snapshot per commit —
    // the per-micro-batch commit cost becomes O(batch), not O(state),
    // which is both the production recommendation at state sizes that
    // dwarf a micro-batch and a measured win on every streaming drain
    // here (snapshots still land in the background per
    // minDeltasForSnapshot, so recovery stays bounded)
    s.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    s
  }

  /** Isolated session for a streaming query: shared SparkContext, own
    * SQLConf, with (a) streaming-state-sized shuffle partitioning —
    * each stateful operator keeps one store PER shuffle partition, and a
    * stream-stream join keeps two, so the batch suite's 32 partitions
    * would mean 64 store lifecycles per micro-batch of a bounded drain —
    * and (b) the RocksDB state backend. Output content is
    * partitioning-independent; only state geometry changes. */
  def isolatedStreamSession(outer: SparkSession, shufflePartitions: Int = 8): SparkSession = {
    val s = outer.newSession()
    s.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    configure(s)
  }
}
