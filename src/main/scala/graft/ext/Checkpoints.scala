package graft.ext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic release of `localCheckpoint` storage.
  *
  * `Dataset.unpersist()` and `catalog.clearCache()` only reach
  * cacheManager entries; a local checkpoint is an RDD-level persist
  * hiding behind a `LogicalRDD` leaf — and often not even at the leaf
  * itself but an ANCESTOR of the leaf's RDD (e.g.
  * [[Ranking.globalRowNumber]] wraps `checkpointed.rdd.zipWithIndex()
  * .map(...)` in its `LogicalRDD`, so the persisted RDD is two
  * dependency hops down). Without an explicit release those blocks
  * linger until the ContextCleaner happens to GC the frame — the
  * documented ~50 s back-to-back-rep artifact (BASELINE.md round 17).
  *
  * [[releaseLineage]] walks the frame's `LogicalRDD` leaves and their
  * transitive RDD dependencies, unpersisting every RDD that holds
  * storage. Call it only after the LAST action on the frame: a
  * localCheckpoint's lineage is truncated, so a released block cannot
  * be recomputed and any later action on the frame fails loudly. */
object Checkpoints {

  /** Unpersist every RDD holding storage in `df`'s RDD lineage
    * (LogicalRDD leaves + transitive dependencies). Safe no-op for
    * frames with no RDD-level persists. */
  def releaseLineage(df: DataFrame): Unit = {
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(r: RDD[_]): Unit =
      if (seen.add(r.id)) {
        if (r.getStorageLevel != StorageLevel.NONE) {
          r.unpersist(blocking = false)
          ()
        }
        r.dependencies.foreach(d => walk(d.rdd))
      }
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => walk(l.rdd)
      case _ => ()
    }
  }
}
