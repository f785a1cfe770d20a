package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Transparent materialized-view rewrite: a Catalyst optimizer rule
  * that answers aggregates over a base table FROM the maintained
  * partials table of [[graft.etl.Incremental]] — the serving half of
  * incremental view maintenance (e83 keeps the MV current; this makes
  * queries USE it without being rewritten by hand). The reference
  * recomputes its serving views from the full costs table on every
  * sync (`sql/views.sql`); with this rule the same dashboards read
  * |keys| rows instead of rescanning history — at 100 TB the
  * difference between a metadata-sized read and a full table scan.
  *
  * What rewrites: `Aggregate(G, A, scan(base))` where
  *  - the child is a scan of the registered base path (bare relation
  *    or attribute-only Project over it — i.e. column pruning; any
  *    Filter/expression in between disqualifies, conservatively:
  *    partials carry no per-row residue to filter on),
  *  - every grouping expression is a bare column ⊆ the MV's keys
  *    (a STRICT SUBSET is fine — partials are mergeable, so coarser
  *    groupings re-aggregate them: `merge()`'s associativity is
  *    exactly what makes the rollup exact), and
  *  - every aggregate is one of the mergeable forms the MV stores:
  *    `sum(cast(v as decimal(38,6)))` → `sum(sum_v)`, `count(lit)` →
  *    `sum(cnt)`, `min(v)` → `min(min_v)`, `max(v)` → `max(max_v)`.
  *    Notably NOT `avg(v)` or bare `sum(v)`: their double accumulation
  *    is order-dependent, so a rewrite could change the answer —
  *    reads that want the mean derive it from the rewritten
  *    sum/count, the [[graft.etl.Incremental.serve]] contract.
  *
  * The rewritten Aggregate reuses the original output exprIds (via
  * aliases), so parent operators are untouched; result types are
  * identical by construction (decimal sums stay (38,6), min/max keep
  * the value type). Registered through
  * `spark.experimental.extraOptimizations` — a batch that runs AFTER
  * the main optimizer, so column pruning has already reduced the
  * child to the attribute-only Project this rule recognizes; use
  * [[MaterializedView.serveWith]] to scope registration to a block.
  *
  * Limitation (documented, not load-bearing for correctness): each
  * MvDef's plan is instantiated once per rule application, so a query
  * that matches the SAME view twice keeps only the first rewrite
  * eligible; the second occurrence is left on the base table.
  */
object MaterializedView {

  /** One registered view: scans of `basePath` aggregated on ⊆ `keys`
    * over `valueCol` may be answered from `mv` (a frame with columns
    * keys ++ cnt/sum_v/min_v/max_v — [[graft.etl.Incremental.partials]]
    * output, typically a parquet read of the maintained table). */
  final case class MvDef(basePath: String, mv: DataFrame, keys: Seq[String], valueCol: String)

  /** Run `body` with the rewrite rule active for `defs`, restoring the
    * session's extra optimizations afterwards. */
  def serveWith[T](spark: SparkSession, defs: Seq[MvDef])(body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ new RewriteToMv(defs)
    try body
    finally spark.experimental.extraOptimizations = prev
  }
}

class RewriteToMv(defs: Seq[MaterializedView.MvDef]) extends Rule[LogicalPlan] {
  import MaterializedView.MvDef

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupings, aggExprs, child, _) =>
      defs.iterator.flatMap(d => tryRewrite(groupings, aggExprs, child, d))
        .nextOption().getOrElse(agg)
  }

  /** The scanned root path, if `p` is a file relation under
    * attribute-only projections. */
  private def scannedPaths(p: LogicalPlan): Seq[String] = p match {
    case Project(projectList, inner) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scannedPaths(inner)
    case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
      h.location.rootPaths.map(_.toString)
    case _ => Seq.empty
  }

  private def tryRewrite(
      groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan,
      d: MvDef): Option[LogicalPlan] = {
    val baseUri = new org.apache.hadoop.fs.Path(d.basePath).toUri.toString
    if (!scannedPaths(child).exists(p => p == baseUri || p.endsWith(d.basePath))) return None
    val groupAttrs = groupings.map {
      case a: AttributeReference if d.keys.contains(a.name) => a
      case _ => return None
    }
    val mvPlan = d.mv.queryExecution.analyzed
    val mvAttr: Map[String, Attribute] = mvPlan.output.map(a => a.name -> a).toMap
    if (!(d.keys ++ Seq("cnt", "sum_v", "min_v", "max_v")).forall(mvAttr.contains)) return None

    def complete(fn: AggregateFunction): AggregateExpression =
      AggregateExpression(fn, Complete, isDistinct = false)

    // the mergeable-form map; the replacement keeps ae's dataType by
    // construction (count(lit) is Long and so is sum(cnt); decimal
    // sums stay (38,6); min/max keep the value type)
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      val repl: Option[AggregateFunction] = ae.aggregateFunction match {
        case Sum(Cast(v: AttributeReference, dt: DecimalType, _, _), _)
            if v.name == d.valueCol && dt == DecimalType(38, 6) =>
          Some(Sum(mvAttr("sum_v")))
        case Count(Seq(l: Literal)) if l.value != null =>
          Some(Sum(mvAttr("cnt")))
        case Min(v: AttributeReference) if v.name == d.valueCol =>
          Some(Min(mvAttr("min_v")))
        case Max(v: AttributeReference) if v.name == d.valueCol =>
          Some(Max(mvAttr("max_v")))
        case _ => None
      }
      repl.map { fn =>
        if (fn.dataType == ae.dataType) complete(fn)
        else Cast(complete(fn), ae.dataType)
      }
    }

    // map each original output onto the MV's partials; None → give up
    val mapped: Seq[Option[NamedExpression]] = aggExprs.map {
      // grouping key flowing through the aggregate output
      case a: AttributeReference if d.keys.contains(a.name) =>
        Some(Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(a: AttributeReference, name) if d.keys.contains(a.name) =>
        Some(Alias(mvAttr(a.name), name)(exprId = al.exprId))
      case al @ Alias(ae: AggregateExpression, name) =>
        mapAgg(ae).map(e => Alias(e, name)(exprId = al.exprId))
      // CollapseProject has usually folded the read-side cast (e.g.
      // decimal sum → double) into the aggregate list by the time this
      // post-optimizer batch runs — rewrite through it
      case al @ Alias(c @ Cast(ae: AggregateExpression, _, _, _), name) =>
        mapAgg(ae).map(e => Alias(c.withNewChildren(Seq(e)), name)(exprId = al.exprId))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) return None
    val mvGroupings: Seq[Expression] = groupAttrs.map(a => mvAttr(a.name))
    Some(Aggregate(mvGroupings, mapped.map(_.get), mvPlan))
  }
}
