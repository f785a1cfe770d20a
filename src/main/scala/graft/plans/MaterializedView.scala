package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
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
  *    under attribute-only Projects — i.e. column pruning — and
  *    deterministic Filters whose predicates reference ONLY MV key
  *    columns; the path comparison qualifies BOTH sides to absolute
  *    filesystem URIs, so a relative `basePath` can never
  *    suffix-collide with an unrelated scan),
  *  - every grouping expression is a bare column ⊆ the MV's keys
  *    (a STRICT SUBSET is fine — partials are mergeable, so coarser
  *    groupings re-aggregate them: `merge()`'s associativity is
  *    exactly what makes the rollup exact). Key-only filters are
  *    exact for the same reason: every row of a group shares its key
  *    values, so filtering groups in the partials table ≡ filtering
  *    rows in the base — the D1 dashboard shape
  *    (`WHERE day >= … GROUP BY service`) serves from the MV. A
  *    filter touching any NON-key column still disqualifies
  *    (partials carry no per-row residue to filter on), and
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
  * When several registered views match one aggregate, the COARSEST
  * (fewest keys) wins — its partials table has the fewest rows, so it
  * is the cheapest exact serve (the rollup-lattice rule every MV
  * advisor applies). Each rewrite instantiates the MV plan with FRESH
  * output exprIds — `MultiInstanceRelation.newInstance` for relation
  * MVs (parquet/table reads, the normal case), an alias-only Project
  * wrapper for derived in-memory plans — so one view can serve
  * multiple occurrences in the same query (e.g. a union of two
  * rollups over the base) without duplicate-attribute conflicts.
  */
object MaterializedView {

  /** One registered view: scans of `basePath` aggregated on ⊆ `keys`
    * over `valueCol` may be answered from `mv` (a frame with columns
    * keys ++ cnt/sum_v and optionally min_v/max_v —
    * [[graft.etl.Incremental.partials]] output, or the cnt/sum-only
    * [[graft.etl.Incremental.retractablePartials]] shape maintained
    * under deletes; typically a parquet read of the maintained
    * table). Without min_v/max_v, min/max aggregates simply don't
    * rewrite. */
  final case class MvDef(basePath: String, mv: DataFrame, keys: Seq[String], valueCol: String)

  /** A registered JOIN view — the star-dashboard shape: an aggregate
    * over the INNER equijoin `scan(leftPath) ⋈ scan(rightPath)` on the
    * same-named `joinKeys`, grouped on ⊆ `keys` over `valueCol`, may
    * be answered from `mv` = the partials of the MAINTAINED join view
    * ([[graft.etl.Incremental.applyJoinFeed]] keeps the view current
    * under mutation; [[graft.etl.Incremental.partials]] over it is
    * this MV). Registration contract: `mv` must be partials of exactly
    * that inner join (either side order), keys/joinKeys are plain
    * column names unambiguous across the two sides, and `keys` may
    * draw from both sides — the c11 star rollup (fact ⋈ dim GROUP BY
    * dim attribute) serves from |keys| partial rows instead of
    * re-joining history. */
  final case class JoinMvDef(
      leftPath: String, rightPath: String, joinKeys: Seq[String],
      mv: DataFrame, keys: Seq[String], valueCol: String)

  /** Run `body` with the rewrite rule active for `defs`, restoring the
    * session's extra optimizations afterwards. */
  def serveWith[T](spark: SparkSession, defs: Seq[MvDef])(body: => T): T =
    serveWith(spark, defs, Nil)(body)

  /** [[serveWith]] including join-view definitions.
    *
    * RE-ENTRANT AND THREAD-SAFE (r21, VERDICT r20 #1): the install/
    * restore of `spark.experimental.extraOptimizations` is a
    * read-modify-write on shared session state — two concurrent serves
    * (or a nested one) interleaving unsynchronized could drop each
    * other's rule mid-body, and the failure mode is the SILENT base-scan
    * fallback servePinned exists to prevent. All mutations serialize on
    * a per-session monitor, and restore REMOVES THIS CALL'S RULE
    * INSTANCE rather than blind-writing the captured previous list, so
    * overlapping serves compose: each body sees its own rule active for
    * its whole extent (MvRewriteSpec runs two concurrent serves and
    * asserts both executed plans read partials only). */
  def serveWith[T](spark: SparkSession, defs: Seq[MvDef],
      joinDefs: Seq[JoinMvDef])(body: => T): T = {
    val rule = new RewriteToMv(defs, joinDefs)
    val monitor = spark.experimental
    monitor.synchronized {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    }
    try body
    finally monitor.synchronized {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  /** Run `body` inside the rewrite-rule context and MATERIALIZE its
    * result there — for callers that hand the served frame onward
    * (the declared MV queries return it to Verify/Bench, which write
    * it later). `extraOptimizations` is read per EXECUTION, not per
    * frame, so a lazy frame returned out of [[serveWith]] re-optimizes
    * WITHOUT the rule at its next action and silently re-derives the
    * dashboard from the base tables: identical rows (the maintained
    * identity guarantees it — no hash can catch this) but base-scan
    * cost. The r20 e122 phase probe measured the difference at sf100:
    * 64.7 s for the escaped frame's re-join vs sub-second for the
    * rewritten |keys|-row serve. The eager `localCheckpoint` executes
    * the REWRITTEN plan in-block; later writes read the materialized
    * rows, never the bases ([[graft.ext.Checkpoints.releaseLineage]]
    * reclaims the blocks after the caller's final action, the
    * established Verify/Bench hygiene). Results are |keys|-sized
    * dashboard aggregates by construction, so the checkpoint is
    * small. */
  def servePinned(spark: SparkSession, defs: Seq[MvDef],
      joinDefs: Seq[JoinMvDef] = Nil)(body: => DataFrame): DataFrame =
    serveWith(spark, defs, joinDefs)(body.localCheckpoint())

  private val PropBase = "graft.mv.basePath"
  private val PropKeys = "graft.mv.keys"
  private val PropValue = "graft.mv.valueCol"
  private val PropRight = "graft.mv.rightPath"
  private val PropJoinKeys = "graft.mv.joinKeys"

  // Spark SQL string literals escape with BACKSLASHES (doubled quotes
  // would concatenate adjacent literals) — same rule DataQuality.rowAudit
  // learned the hard way
  private def sqlStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Register a maintained partials table as a CATALOG table carrying
    * its own rewrite metadata: the parquet at `mvPath` becomes an
    * external table named `name`, with base path / keys / value column
    * in TBLPROPERTIES. With a persistent metastore
    * ([[graft.etl.Sessions.durableCatalog]]) the definition survives a
    * restart — a fresh session calls [[fromCatalog]] and serves, the
    * same durability contract the `costs` view has. The base path is
    * stored fully qualified, so the rewrite's exact-URI match is
    * independent of the registering process's working directory. */
  def register(
      spark: SparkSession, name: String, mvPath: String,
      basePath: String, keys: Seq[String], valueCol: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"MV table name must be a plain SQL identifier, got '$name'")
    require(keys.nonEmpty && keys.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"MV keys must be plain identifiers, got ${keys.mkString(",")}")
    val conf = spark.sessionState.newHadoopConf()
    def q(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).makeQualified(hp).toString
    }
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"""CREATE TABLE $name USING parquet LOCATION ${sqlStr(q(mvPath))}
         |TBLPROPERTIES (
         |  ${sqlStr(PropBase)} = ${sqlStr(q(basePath))},
         |  ${sqlStr(PropKeys)} = ${sqlStr(keys.mkString(","))},
         |  ${sqlStr(PropValue)} = ${sqlStr(valueCol)})""".stripMargin)
  }

  /** [[register]] for a JOIN view ([[JoinMvDef]]): the partials of the
    * maintained `scan(leftPath) ⋈ scan(rightPath)` become a catalog
    * table carrying both base paths and the equi-keys — the same
    * restart-surviving durability contract as scan MVs. */
  def registerJoin(
      spark: SparkSession, name: String, mvPath: String,
      leftPath: String, rightPath: String, joinKeys: Seq[String],
      keys: Seq[String], valueCol: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"MV table name must be a plain SQL identifier, got '$name'")
    require(keys.nonEmpty && (keys ++ joinKeys).forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"MV keys must be plain identifiers, got ${(keys ++ joinKeys).mkString(",")}")
    require(joinKeys.nonEmpty, "registerJoin: joinKeys must be non-empty")
    val conf = spark.sessionState.newHadoopConf()
    def q(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).makeQualified(hp).toString
    }
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"""CREATE TABLE $name USING parquet LOCATION ${sqlStr(q(mvPath))}
         |TBLPROPERTIES (
         |  ${sqlStr(PropBase)} = ${sqlStr(q(leftPath))},
         |  ${sqlStr(PropRight)} = ${sqlStr(q(rightPath))},
         |  ${sqlStr(PropJoinKeys)} = ${sqlStr(joinKeys.mkString(","))},
         |  ${sqlStr(PropKeys)} = ${sqlStr(keys.mkString(","))},
         |  ${sqlStr(PropValue)} = ${sqlStr(valueCol)})""".stripMargin)
  }

  private def props(spark: SparkSession, name: String): Map[String, String] =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(name)).properties

  private def prop(p: Map[String, String], name: String, k: String): String =
    p.getOrElse(k, throw new IllegalArgumentException(
      s"catalog table '$name' has no '$k' property — not a registered MV"))

  /** Rebuild an [[MvDef]] from a catalog table written by [[register]]
    * — the restart half of the durability contract. */
  def fromCatalog(spark: SparkSession, name: String): MvDef = {
    val p = props(spark, name)
    MvDef(prop(p, name, PropBase), spark.table(name),
      prop(p, name, PropKeys).split(',').toSeq, prop(p, name, PropValue))
  }

  /** Rebuild a [[JoinMvDef]] from a catalog table written by
    * [[registerJoin]]. */
  def joinFromCatalog(spark: SparkSession, name: String): JoinMvDef = {
    val p = props(spark, name)
    JoinMvDef(prop(p, name, PropBase), prop(p, name, PropRight),
      prop(p, name, PropJoinKeys).split(',').toSeq, spark.table(name),
      prop(p, name, PropKeys).split(',').toSeq, prop(p, name, PropValue))
  }

  /** [[serveWith]] over definitions reconstructed from the catalog —
    * each name resolves to a join MV (has the rightPath property) or a
    * scan MV, so one list serves a mixed dashboard session. */
  def serveFromCatalog[T](spark: SparkSession, names: Seq[String])(body: => T): T = {
    val (joins, scans) = names.partition(n => props(spark, n).contains(PropRight))
    serveWith(spark, scans.map(fromCatalog(spark, _)),
      joins.map(joinFromCatalog(spark, _)))(body)
  }
}

class RewriteToMv(defs: Seq[MaterializedView.MvDef],
    joinDefs: Seq[MaterializedView.JoinMvDef] = Nil)
    extends Rule[LogicalPlan] with PredicateHelper {
  import MaterializedView.{JoinMvDef, MvDef}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupings, aggExprs, child, _) =>
      // coarsest matching view first: fewest keys = fewest partial rows
      // (a scan aggregate can never match a join def and vice versa, so
      // the two lists need no relative ordering)
      defs.sortBy(_.keys.size).iterator
        .flatMap(d => tryRewrite(groupings, aggExprs, child, d))
        .nextOption()
        .orElse(joinDefs.sortBy(_.keys.size).iterator
          .flatMap(d => tryJoinRewrite(groupings, aggExprs, child, d))
          .nextOption())
        .getOrElse(agg)
  }

  /** The scanned root paths plus any filter predicates, if `p` is a
    * file relation under attribute-only projections and Filters.
    * Filters are collected (not rejected) — eligibility of their
    * predicates is the caller's check. */
  private def scanRoots(p: LogicalPlan): Option[(Seq[String], Seq[Expression])] = p match {
    case Project(projectList, inner) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scanRoots(inner)
    case Filter(cond, inner) =>
      scanRoots(inner).map { case (paths, fs) => (paths, cond +: fs) }
    case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
      Some((h.location.rootPaths.map(_.toString), Nil))
    case _ => None
  }

  /** `path` as a fully-qualified filesystem URI (scheme + absolute
    * path), so `data/costs` and `/backup/data/costs` can never be
    * confused — base-path matching is EXACT equality on these. */
  private def qualify(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    p.getFileSystem(conf).makeQualified(p).toString
  }

  private def tryRewrite(
      groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan,
      d: MvDef): Option[LogicalPlan] = {
    val (paths, filters) = scanRoots(child).getOrElse(return None)
    // EXACT root-path set match: a multi-root read (e.g.
    // spark.read.parquet(base, extra)) covers MORE rows than the
    // registered base, so serving it from the MV would silently drop
    // the extra roots' contribution — `exists` would have matched it
    if (paths.map(qualify).toSet != Set(qualify(d.basePath))) return None
    rewriteOnMv(groupings, aggExprs, filters, d.mv, d.keys, d.valueCol)
  }

  /** Strip attribute-only Projects (collecting Filters) down to a
    * Join node — the star-dashboard child shape after the main
    * optimizer's pushdown and column pruning have run. */
  private def joinUnder(p: LogicalPlan): Option[(Join, Seq[Expression])] = p match {
    case Project(projectList, inner) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      joinUnder(inner)
    case Filter(cond, inner) =>
      joinUnder(inner).map { case (j, fs) => (j, cond +: fs) }
    case j: Join => Some((j, Nil))
    case _ => None
  }

  private def tryJoinRewrite(
      groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan,
      d: JoinMvDef): Option[LogicalPlan] = {
    val (join, topFilters) = joinUnder(child).getOrElse(return None)
    if (join.joinType != Inner) return None
    val (lPaths, lFilters) = scanRoots(join.left).getOrElse(return None)
    val (rPaths, rFilters) = scanRoots(join.right).getOrElse(return None)
    val lQ = qualify(d.leftPath)
    val rQ = qualify(d.rightPath)
    // the inner join is symmetric, so either side order matches; each
    // side's root-path SET must equal exactly its registered base — a
    // multi-root side covers more rows than the view maintains, and
    // serving it would silently drop the extra paths' rows
    val lSet = lPaths.map(qualify).toSet
    val rSet = rPaths.map(qualify).toSet
    val sidesMatch =
      (lSet == Set(lQ) && rSet == Set(rQ)) || (lSet == Set(rQ) && rSet == Set(lQ))
    if (!sidesMatch) return None
    // the join condition must be exactly the registered equi-keys:
    // every conjunct an EqualTo over two same-named key attributes,
    // and every registered key covered — anything extra (a theta
    // residual, an expression key) disqualifies
    val eqNames = join.condition.toSeq.flatMap(splitConjunctivePredicates).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name == b.name && d.joinKeys.contains(a.name) => a.name
      case _ => return None
    }
    if (eqNames.toSet != d.joinKeys.toSet) return None
    // the main optimizer mirrors key predicates onto both sides and
    // infers IsNotNull on the equi-keys; on the INNER-join view the
    // IsNotNull(joinKey) conjuncts are vacuous (a null key never
    // equi-matches, so no view row has one) — drop them, and leave
    // everything else to the shared key-only eligibility check (the
    // mirrored duplicates collapse in rewriteOnMv's semantic dedup)
    val kept = (topFilters ++ lFilters ++ rFilters)
      .flatMap(splitConjunctivePredicates).filterNot {
        case IsNotNull(a: AttributeReference) => d.joinKeys.contains(a.name)
        case _ => false
      }
    rewriteOnMv(groupings, aggExprs, kept, d.mv, d.keys, d.valueCol)
  }

  /** The shared rewrite tail: key-only filter eligibility, grouping ⊆
    * keys, mergeable-aggregate mapping, and the re-rooted Aggregate
    * over the partials plan. */
  private def rewriteOnMv(
      groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      filters: Seq[Expression],
      mv: DataFrame,
      keys: Seq[String],
      valueCol: String): Option[LogicalPlan] = {
    // key-only, deterministic filters rewrite onto the partials table
    // (every row of a group shares its keys, so group-level filtering
    // is exact); anything else disqualifies
    if (!filters.forall(f => f.deterministic &&
        f.references.forall(a => keys.contains(a.name)))) return None
    val groupAttrs = groupings.map {
      case a: AttributeReference if keys.contains(a.name) => a
      case _ => return None
    }
    // strip SubqueryAliases: this rule runs AFTER the optimizer batch
    // that eliminates them, and the physical planner has no strategy
    // for a bare alias (a catalog-table MV arrives as
    // SubqueryAlias(Relation) from spark.table); then re-instantiate
    // with FRESH exprIds so the same view can serve multiple
    // occurrences in one query (two subtrees sharing attribute ids
    // would make the rewritten plan unresolvable)
    val mvPlan = org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(
      mv.queryExecution.analyzed) match {
      case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        m.newInstance().asInstanceOf[LogicalPlan]
      // a DERIVED mv plan (e.g. partials computed in-memory rather than
      // read back from parquet) is not a MultiInstanceRelation — mint
      // fresh OUTPUT exprIds via an alias-only Project so two rewritten
      // occurrences in one query never expose duplicate attributes to
      // their common parent (sibling branches may still share inner
      // ids, which is fine: references never cross branches, exactly as
      // in a self-union)
      case other =>
        Project(other.output.map(a => Alias(a, a.name)()), other)
    }
    val mvAttr: Map[String, Attribute] = mvPlan.output.map(a => a.name -> a).toMap
    // cnt/sum_v are the mergeable core every MV carries; min_v/max_v are
    // OPTIONAL — a RETRACTABLE MV (Incremental.retractablePartials,
    // maintained under deletes by applyFeed) stores only the invertible
    // pair, and can still serve count/sum aggregates (min/max queries
    // then simply don't rewrite)
    if (!(keys ++ Seq("cnt", "sum_v")).forall(mvAttr.contains)) return None

    def complete(fn: AggregateFunction): AggregateExpression =
      AggregateExpression(fn, Complete, isDistinct = false)

    // A GLOBAL aggregate (no GROUP BY) over an empty/filtered-to-empty
    // base returns count = 0, but sum(cnt) over the empty MV returns
    // NULL — the count rewrite must coalesce to 0 in that case.
    val global = groupings.isEmpty

    // the mergeable-form map; the replacement keeps ae's dataType by
    // construction (count(lit) is Long and so is sum(cnt); decimal
    // sums stay (38,6); min/max keep the value type)
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      val repl: Option[Expression] = ae.aggregateFunction match {
        case Sum(Cast(v: AttributeReference, dt: DecimalType, _, _), _)
            if v.name == valueCol && dt == DecimalType(38, 6) =>
          Some(complete(Sum(mvAttr("sum_v"))))
        case Count(Seq(l: Literal)) if l.value != null =>
          val s = complete(Sum(mvAttr("cnt")))
          Some(if (global) Coalesce(Seq(s, Literal(0L))) else s)
        case Min(v: AttributeReference)
            if v.name == valueCol && mvAttr.contains("min_v") =>
          Some(complete(Min(mvAttr("min_v"))))
        case Max(v: AttributeReference)
            if v.name == valueCol && mvAttr.contains("max_v") =>
          Some(complete(Max(mvAttr("max_v"))))
        case _ => None
      }
      repl.map { e =>
        if (e.dataType == ae.dataType) e else Cast(e, ae.dataType)
      }
    }

    // map each original output onto the MV's partials; None → give up
    val mapped: Seq[Option[NamedExpression]] = aggExprs.map {
      // grouping key flowing through the aggregate output
      case a: AttributeReference if keys.contains(a.name) =>
        Some(Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(a: AttributeReference, name) if keys.contains(a.name) =>
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
    // the base scan's key filters, re-rooted onto the partials table;
    // mirrored duplicates (the optimizer pushes a key predicate onto
    // BOTH sides of a join) collapse once re-rooted, by semanticEquals
    val rerooted = filters.map(_.transform { case a: AttributeReference => mvAttr(a.name) })
    val deduped = rerooted.foldLeft(Vector.empty[Expression]) { (acc, e) =>
      if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
    }
    val mvChild = deduped.foldLeft(mvPlan: LogicalPlan) { (pl, cond) => Filter(cond, pl) }
    Some(Aggregate(mvGroupings, mapped.map(_.get), mvChild))
  }
}
