package graft.ext

import org.apache.spark.sql.DataFrame

/** Scale-ADAPTIVE parallelism for CPU-heavy map fronts (r21, guide §2
  * "make partitioning scale-adaptive — derive from input size, not a
  * constant tuned for local mode or the cluster").
  *
  * The expensive per-row fronts (BPE merge-chain application, MinHash
  * shingling) sit directly on a parquet scan, so their parallelism is
  * the SPLIT COUNT of the input. A corpus slice smaller than one split
  * runs the whole chain on one core while the rest of the cluster
  * idles — measured at bench scale as a 1.4 s single-task encode job
  * (JobProfile, e99). At 100 TB the scan yields orders of magnitude
  * more splits than cores and no help is needed.
  */
object Adaptive {

  /** Fan `df` out to the session's default parallelism IFF its estimated
    * size cannot fill the cluster at the configured split size — i.e.
    * exactly when the scan would under-parallelize. The added exchange
    * carries the small input once (by construction it only fires when
    * the input is at most cores × maxPartitionBytes); at scale the
    * estimate exceeds the bound and this is an identity. Row order
    * downstream is never load-bearing (every consumer aggregates or
    * re-sorts), and round-robin repartition is deterministic under
    * retries (sortBeforeRepartition stays on). */
  def fanOutSmall(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(splitBytes) * cores) df.repartition(cores) else df
  }
}
