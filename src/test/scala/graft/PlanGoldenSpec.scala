package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning, SinglePartition}

/** Plan-shape regression goldens (VERDICT r13 item 6) for the ten most
  * expensive declared queries (r13 clean-anchor ranking): the audited
  * physical shapes the bench numbers rely on — broadcasts placed,
  * exchanges counted, no cartesian — snapshotted as normalized operator
  * skeletons and diffed. A change that un-broadcasts a dim join, adds
  * an exchange, or reshapes a pipeline fails here with a line diff
  * BEFORE it shows up as a silent bench regression.
  *
  * The skeleton is the operator tree with node NAMES only (plus the
  * partitioning flavor on shuffles and the join type on joins) —
  * expression ids, paths, sizes, and stats are dropped, so the golden
  * is stable across runs/hosts while still pinning every operator and
  * its position. Snapshots are the PRE-EXECUTION plan (AQE initial): it
  * is fully deterministic for fixed inputs, where final adaptive plans
  * embed runtime stage decisions. Exchange-REUSE shapes (AQE-final
  * only) are asserted separately in [[PlanSpec]].
  *
  * Regenerate intentionally-changed goldens with:
  * `SPARK_GRAFT_REGEN_GOLDENS=1 sbt "testOnly graft.PlanGoldenSpec"`
  * and review the diff in git.
  */
class PlanGoldenSpec extends SparkSpec {

  /** Top-10 by r13 clean-anchor median (BENCH_HISTORY.jsonl). */
  private val goldenQueries = Seq(
    "e54_streaming_dedup_ingest",
    "e55_streaming_ann_ingest",
    "e38_corpus_pipeline_para",
    "e53_dedup_index_maintenance",
    "e35_corpus_pipeline",
    "e71_column_profile",
    "e64_hybrid_index_rrf",
    "e51_tokenized_pack_shards",
    "e27_dedup_pipeline",
    "e50_bpe_encode")

  private val goldenDir = Paths.get("src/test/resources/plan_goldens")
  private val regen = sys.env.contains("SPARK_GRAFT_REGEN_GOLDENS")

  private def label(p: SparkPlan): String = p match {
    case e: ShuffleExchangeExec => e.outputPartitioning match {
      case _: HashPartitioning  => "Exchange(hash)"
      case _: RangePartitioning => "Exchange(range)"
      case SinglePartition      => "Exchange(single)"
      case other                => s"Exchange(${other.getClass.getSimpleName})"
    }
    case _: BroadcastExchangeExec => "BroadcastExchange"
    case j: BaseJoinExec          => s"${j.nodeName}(${j.joinType})"
    case other                    => other.nodeName
  }

  private def skeleton(p: SparkPlan): String = {
    val sb = new StringBuilder
    def walk(n: SparkPlan, depth: Int): Unit = n match {
      // recurse THROUGH the adaptive wrapper into the initial plan
      case a: AdaptiveSparkPlanExec =>
        sb.append("  " * depth).append("AdaptiveSparkPlan\n")
        walk(a.executedPlan, depth + 1)
      // recurse INTO cached subtrees: queries that .cache() internally
      // (the corpus pipelines) would otherwise golden as a 2-line
      // InMemoryTableScan leaf, pinning nothing of the plan they pay for
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        sb.append("  " * depth).append("InMemoryTableScan\n")
        walk(i.relation.cachedPlan, depth + 1)
      // runtime stage wrappers (appear once an adaptive subtree has
      // materialized, e.g. inside a cached relation) are execution
      // artifacts, not shape — traverse them transparently
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan, depth)
      case _ =>
        sb.append("  " * depth).append(label(n)).append('\n')
        n.children.foreach(walk(_, depth + 1))
    }
    walk(p, 0)
    sb.toString
  }

  private def lineDiff(expected: String, actual: String): String = {
    val e = expected.linesIterator.toVector
    val a = actual.linesIterator.toVector
    val out = new StringBuilder
    val n = math.max(e.size, a.size)
    var shown = 0
    (0 until n).foreach { i =>
      val el = e.lift(i).getOrElse("<end>")
      val al = a.lift(i).getOrElse("<end>")
      if (el != al && shown < 40) {
        out.append(f"  line ${i + 1}%3d: golden '$el'  !=  actual '$al'\n")
        shown += 1
      }
    }
    out.toString
  }

  /** Streaming entries (ADVICE r14): the main golden for e54/e55 pins
    * only the post-stream readback — the micro-batch plan the bench
    * cost flows through is recorded by the query itself
    * ([[graft.streaming.MicroBatchPlans]], populated as a side effect
    * of running `fn` in the main golden test) and goldened here as
    * `<name>.microbatch.plan`. For these foreachBatch sinks that plan
    * is the ADMISSION shape (bounded file-source scan → ForeachBatch);
    * the heavy inner dedup/append work runs as ordinary batch queries
    * on the code path the e52/e53 goldens pin. */
  private val streamingGoldenQueries =
    Seq("e54_streaming_dedup_ingest", "e55_streaming_ann_ingest")

  private def checkGolden(fileName: String, actual: String): Unit = {
    val file = goldenDir.resolve(fileName)
    if (regen) {
      Files.createDirectories(goldenDir)
      Files.write(file, actual.getBytes(StandardCharsets.UTF_8))
      info(s"regenerated $file (${actual.linesIterator.size} lines)")
    } else {
      assert(Files.exists(file),
        s"missing golden $file — run with SPARK_GRAFT_REGEN_GOLDENS=1 to create")
      val expected = new String(Files.readAllBytes(file), StandardCharsets.UTF_8)
      assert(expected == actual,
        s"plan shape drifted for $fileName (regen deliberately with " +
          s"SPARK_GRAFT_REGEN_GOLDENS=1 and review):\n${lineDiff(expected, actual)}")
    }
  }

  goldenQueries.foreach { name =>
    test(s"golden plan skeleton: $name") {
      // other suites (and earlier goldens) may have cached shared
      // frames; a CacheManager hit would swap a scan for an
      // InMemoryRelation and make the skeleton order-dependent
      spark.catalog.clearCache()
      val df = Queries.byName(name).fn(spark, sf001)
      checkGolden(s"$name.plan", skeleton(df.queryExecution.executedPlan))
      spark.catalog.clearCache()
    }
  }

  streamingGoldenQueries.foreach { name =>
    test(s"golden micro-batch plan skeleton: $name") {
      // the main golden test above already ran `fn`, which drained the
      // stream and recorded its final IncrementalExecution; re-run only
      // if something (test filtering) skipped it
      val plan = graft.streaming.MicroBatchPlans.get(name).getOrElse {
        spark.catalog.clearCache()
        Queries.byName(name).fn(spark, sf001)
        spark.catalog.clearCache()
        graft.streaming.MicroBatchPlans.get(name).getOrElse(
          fail(s"$name ran but recorded no micro-batch plan"))
      }
      checkGolden(s"$name.microbatch.plan", skeleton(plan))
    }
  }
}
