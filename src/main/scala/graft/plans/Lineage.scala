package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extraction from a frame's analyzed plan: for
  * every output column, the set of SOURCE columns (`<source>.<col>`,
  * source = the scanned file root's basename or a relation label) that
  * feed it through any chain of projections, aggregates, joins,
  * windows, generators, and unions — the impact-analysis surface the
  * governance stack needs (e.g. "which served columns depend on
  * `user_id`?" before a [[graft.etl.Privacy.forget]] purge, or which
  * downstream reports a [[graft.etl.DataQuality]] violation taints).
  *
  * Pure plan analysis: walks the ANALYZED logical plan (before the
  * optimizer rewrites column references away), never executes
  * anything, never touches data — O(plan size), driver-only, safe on
  * a plan over 100 TB. Lineage here is data lineage through
  * expressions; columns consumed only by filters/join conditions are
  * CONTROL dependencies and deliberately not included in the
  * per-column sets (they gate rows, they don't flow into values) —
  * [[controlColumns]] reports them separately.
  */
object Lineage {

  /** output column name → source columns feeding its VALUES. */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = trace(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty[String])).toMap
  }

  /** Source columns consumed by filters and join conditions anywhere in
    * the plan — the control-dependency complement of
    * [[columnLineage]]. */
  def controlColumns(df: DataFrame): Set[String] = {
    val plan = df.queryExecution.analyzed
    val m = trace(plan)
    def refs(e: Expression): Set[String] =
      e.references.toSeq.flatMap(a => m.getOrElse(a.exprId, Set.empty[String])).toSet
    plan.collect {
      case Filter(cond, _) => refs(cond)
      case j: Join => j.condition.map(refs).getOrElse(Set.empty[String])
    }.flatten.toSet
  }

  private def baseName(n: String): String =
    n.stripSuffix(".parquet").stripSuffix(".orc").stripSuffix(".csv")

  private def label(l: LogicalRelation): String = l.relation match {
    case h: HadoopFsRelation =>
      h.location.rootPaths.headOption
        .map(p => baseName(p.getName))
        .getOrElse("relation")
    case _ => l.catalogTable.map(_.identifier.table).getOrElse("relation")
  }

  private def resolve(e: Expression, ch: Map[ExprId, Set[String]]): Set[String] =
    e.references.toSeq.flatMap(a => ch.getOrElse(a.exprId, Set(s"?.${a.name}"))).toSet

  private def named(
      exprs: Seq[NamedExpression], ch: Map[ExprId, Set[String]]): Map[ExprId, Set[String]] =
    exprs.map {
      case a: Attribute => a.exprId -> ch.getOrElse(a.exprId, Set(s"?.${a.name}"))
      case al: Alias => al.exprId -> resolve(al.child, ch)
      case ne => ne.exprId -> resolve(ne, ch)
    }.toMap

  private def trace(p: LogicalPlan): Map[ExprId, Set[String]] = p match {
    case l: LogicalRelation =>
      val src = label(l)
      l.output.map(a => a.exprId -> Set(s"$src.${a.name}")).toMap
    case lr: LocalRelation =>
      lr.output.map(a => a.exprId -> Set(s"local.${a.name}")).toMap
    case pr: Project =>
      val ch = trace(pr.child)
      ch ++ named(pr.projectList, ch)
    case ag: Aggregate =>
      val ch = trace(ag.child)
      ch ++ named(ag.aggregateExpressions, ch)
    case w: Window =>
      val ch = trace(w.child)
      ch ++ named(w.windowExpressions, ch)
    case g: Generate =>
      val ch = trace(g.child)
      val gen = resolve(g.generator, ch)
      ch ++ g.generatorOutput.map(a => a.exprId -> gen).toMap
    case u: Union =>
      val childMaps = u.children.map(trace)
      val byPos = u.children.map(_.output).transpose
      val merged = u.output.zip(byPos).map { case (out, ins) =>
        out.exprId -> ins.zip(childMaps)
          .flatMap { case (a, m) => m.getOrElse(a.exprId, Set.empty[String]) }.toSet
      }
      childMaps.reduce(_ ++ _) ++ merged
    case e: Expand =>
      val ch = trace(e.child)
      val merged = e.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> e.projections.flatMap(row => resolve(row(i), ch)).toSet
      }
      ch ++ merged
    case sa: SubqueryAlias => trace(sa.child)
    // catalog views (the durable `costs` view is the governance surface
    // users actually query): the view's output IS its stored plan's
    // output, so lineage flows through to the base tables — a consumer
    // of `costs.cost` sees the per-source normalized parquet columns
    case v: View => trace(v.child)
    // streaming sources: a `readStream` plan's leaf is a
    // StreamingRelation (V1 file sources) — label by the source path's
    // basename so stream lineage reads like its batch twin
    case sr: org.apache.spark.sql.execution.streaming.runtime.StreamingRelation =>
      val src = sr.dataSource.options.get("path")
        .map(p => baseName(new org.apache.hadoop.fs.Path(p).getName))
        .getOrElse(sr.sourceName)
      sr.output.map(a => a.exprId -> Set(s"$src.${a.name}")).toMap
    case s2: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2 =>
      s2.output.map(a => a.exprId -> Set(s"${s2.sourceName}.${a.name}")).toMap
    // any other leaf (DSv2 relations, ranges, …): label by node name so
    // unknown sources still attribute deterministically instead of `?`
    case leaf if leaf.children.isEmpty =>
      val src = leaf.nodeName.toLowerCase(java.util.Locale.ROOT)
      leaf.output.map(a => a.exprId -> Set(s"$src.${a.name}")).toMap
    case _ =>
      // joins, filters, sorts, limits, repartitions, … : output attrs
      // pass through from whichever child owns them
      p.children.map(trace).foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
  }
}
