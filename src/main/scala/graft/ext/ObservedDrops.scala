package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Shared drop-surfacing for operators that bound their work (maxDf hot
  * posting lists, maxBucket LSH buckets): an `observe` metric counts the
  * discarded items inside the operator's own job — no extra pass — and a
  * per-session listener warns on stderr after the action completes, so a
  * silently-thinned result never masquerades as a complete one.
  *
  * The listener rides Spark's (async) listener bus; callers in tests
  * must poll for the warning rather than assert right after the action.
  *
  * Coverage boundary (best-effort by design): when AQE discards the
  * metric's subtree via empty-relation propagation, the rows are
  * recovered from the adaptive stage cache — but only if the metric's
  * own stage MATERIALIZED. If a *different* stage's emptiness lets AQE
  * cancel the metric stage mid-flight, the count is partial (tasks that
  * completed before the kill) or absent; a recovered count is therefore
  * a LOWER BOUND, which is the right polarity for a warning. The
  * engine's own shapes (self-joins of the observed frame) learn
  * emptiness from the metric stage itself, so they report exactly.
  */
private[ext] object ObservedDrops {

  private val seq = new java.util.concurrent.atomic.AtomicLong()
  private val recoveryBroken = new java.util.concurrent.atomic.AtomicBoolean()
  // weak keys: the registry must not pin a stopped session in memory
  private val sessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Attach a (dropped, largest) metric under `kind` and ensure the
    * session's warn listener. The frame's rows are unchanged.
    *
    * If the observed frame is later SELF-JOINED, both sides carry the
    * same metric node — Spark allows the duplicate name because the
    * subtrees are `sameResult` (and exchange reuse stays available,
    * since both sides remain identical). When reuse does not fire (tiny
    * inputs planned as broadcast), each executed branch adds its count,
    * so `dropped` can arrive ×(branches run): treat it as "nonzero ⇒
    * the bound engaged", not as an exact tally, in such shapes. */
  def observe(df: DataFrame, kind: String, dropped: Column, largest: Column): DataFrame = {
    register(df.sparkSession)
    df.observe(s"graft_drop_${kind}_${seq.incrementAndGet()}",
      dropped.as("dropped"), largest.as("largest"))
  }

  private def message(kind: String, dropped: Long, largest: Long): String = kind match {
    case "jaccard_maxdf" =>
      s"[graft] jaccardPairs maxDf dropped $dropped hot posting list(s) " +
        s"(largest held $largest docs); pairs sharing only those shingles are " +
        "not reported and intersection counts shrink — raise maxDf " +
        "(Int.MaxValue = exact) if this matters"
    case "lsh_maxbucket" =>
      s"[graft] lshDupPairs maxBucket engaged: overfull bucket(s) dropped " +
        s"(largest held $largest rows; ~$dropped entries across join branches); " +
        "pairs confined to those buckets are not reported — raise maxBucket " +
        "or add tables if this matters"
    case other =>
      s"[graft] $other dropped $dropped item(s) (largest $largest)"
  }

  private def register(spark: SparkSession): Unit =
    if (sessions.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = {
          // observedMetrics walks only the FINAL plan; AQE's
          // empty-relation propagation can discard the subtree holding
          // the metric node after its stage already ran — precisely
          // the all-candidates-dropped case the warning exists for.
          // Recover those rows from the adaptive stage cache.
          // NonFatal + LinkageError: the helper reaches into Spark's
          // adaptive internals, so a jar-version mismatch surfaces as
          // NoSuchMethodError — degrade to final-tree coverage but say
          // so ONCE; anything else fatal (OOM, interrupt) propagates
          val recovered =
            try org.apache.spark.sql.execution.adaptive.GraftAdaptiveMetrics
              .observedMetricsWithStages(qe.executedPlan)
            catch {
              case e @ (scala.util.control.NonFatal(_) | _: LinkageError) =>
                if (recoveryBroken.compareAndSet(false, true))
                  System.err.println(
                    "[graft] AQE metric recovery unavailable (" + e +
                      "); drop warnings cover only metrics surviving in the final plan")
                Map.empty[String, org.apache.spark.sql.Row]
            }
          // populated-wins merge (same rule as GraftAdaptiveMetrics.offer):
          // a never-run CollectMetricsExec clone surviving in the final
          // tree reports an all-null initial-state row — letting it
          // clobber a recovered populated row would silence the warning
          // this listener exists to emit
          val finalsKept = qe.observedMetrics.filter { case (name, row) =>
            !recovered.contains(name) ||
              (0 until row.length).exists(i => !row.isNullAt(i))
          }
          (recovered ++ finalsKept).foreach { case (name, row) =>
            if (name.startsWith("graft_drop_") && !row.isNullAt(0) && row.getLong(0) > 0)
              System.err.println(message(
                name.stripPrefix("graft_drop_").replaceAll("_\\d+$", ""),
                row.getLong(0),
                if (row.isNullAt(1)) 0L else row.getLong(1)))
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
