package graft.plans

import graft.functions.ChProjections
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The Catalyst analogue of ClickHouse's `optimize_use_projections`
  * (round-17 VERDICT #7 stretch, the "automatic rewrite" half): an
  * `Aggregate` directly over a base table is answered from a
  * MATERIALIZED aggregate projection of that table when
  *
  *  - the query's GROUP BY expression set equals the projection's
  *    (canonical-text comparison — with equal grouping, every base
  *    group is exactly one stored projection row, so no
  *    re-aggregation is needed at all), and
  *  - every `AggregateExpression` in the query's output maps onto a
  *    stored projection column of the SAME data type (expressions
  *    AROUND aggregates — `sum(x)/count(*)` — are kept and only their
  *    aggregate leaves are substituted).
  *
  * The rewrite replaces the whole Aggregate with a `Project` over the
  * projection table's relation, aliasing each output to its original
  * exprId so parent operators (sorts, filters, joins) resolve
  * untouched. Anything that doesn't match bails to the base table —
  * a missed rewrite is only a missed speedup, never a wrong answer.
  *
  * Scope is deliberately exact-match: CH can additionally answer a
  * COARSER grouping by re-aggregating projection rows; that variant
  * adds a partial re-aggregation and is left out until a workload
  * needs it (the machinery — canonical maps per projection — already
  * supports it).
  *
  * Gated on `spark.graft.projections.auto` (default off): projections
  * here reflect their last MATERIALIZE (see [[ChProjections]]), so
  * auto-answering is opt-in to that freshness contract, where CH —
  * whose projections are transactionally maintained — defaults on.
  * Guards are ordered cheapest-first: registry-empty and conf checks
  * cost nothing on the overwhelmingly common non-projection query.
  *
  * At 100 TB this is the materialized-rollup read path: a dashboard
  * aggregate over the fact table becomes a scan of the
  * |distinct keys|-sized projection — no fact scan, no shuffle — with
  * plan equality to the hand-written readProjection pinned in
  * ChProjectionsSpec and answer equality oracle-gated (r81).
  */
class ProjectionRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!ChProjections.anyDeclared) return plan
    if (!spark.conf.getOption(ChProjections.autoConfKey).contains("true"))
      return plan
    // self-read guard: a MATERIALIZE's own build query must aggregate
    // the base table, never the projection it is refreshing
    if (ChProjections.materializing.get()) return plan
    plan.transformUp {
      case agg: Aggregate =>
        baseRelOf(agg.child).flatMap { rel =>
          val table = rel.catalogTable.get.identifier.table
          ChProjections.autoRewriteInfos(table).view
            .flatMap(tryRewrite(agg, _)).headOption
        }.getOrElse(agg)
    }
  }

  /** The aggregate's child as a catalog base relation — possibly under
    * the column-pruning Project the optimizer has inserted by the time
    * user rules run (attribute-only, so it never changes semantics).
    */
  private def baseRelOf(p: LogicalPlan): Option[LogicalRelation] = p match {
    case rel: LogicalRelation if rel.catalogTable.isDefined => Some(rel)
    case Project(pl, rel: LogicalRelation)
        if rel.catalogTable.isDefined &&
          pl.forall(_.isInstanceOf[AttributeReference]) => Some(rel)
    case _ => None
  }

  private def tryRewrite(agg: Aggregate,
      info: ChProjections.ProjInfo): Option[LogicalPlan] = {
    val qGroups = agg.groupingExpressions.map(ChProjections.canon).toSet
    if (qGroups != info.groupCanons) return None
    // resolve the projection relation fresh (its file index must see
    // the latest MATERIALIZE); analysis only — no optimizer re-entry
    if (!spark.catalog.tableExists(info.projTable)) return None
    val projRel = EliminateSubqueryAliases(
      spark.table(info.projTable).queryExecution.analyzed)
    def projAttr(name: String): Option[Attribute] =
      projRel.output.find(_.name.equalsIgnoreCase(name))

    var ok = true
    def mapExpr(e: Expression): Expression = {
      if (!ok) return e
      e match {
        case ae: AggregateExpression =>
          info.aggMap.get(ChProjections.canon(ae)).flatMap(projAttr) match {
            case Some(a) if a.dataType == ae.dataType => a
            case _ => ok = false; ae
          }
        case other =>
          info.groupMap.get(ChProjections.canon(other))
            .flatMap(projAttr) match {
            case Some(a) if a.dataType == other.dataType => a
            case _ => other.mapChildren(mapExpr)
          }
      }
    }
    val outputs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al: Alias =>
        Alias(mapExpr(al.child), al.name)(exprId = al.exprId)
      case ar: AttributeReference =>
        mapExpr(ar) match {
          case a: Attribute => Alias(a, ar.name)(exprId = ar.exprId)
          case _ => ok = false; ar
        }
      case other => ok = false; other
    }
    // every output must have actually LOST its aggregates — an
    // AggregateExpression surviving outside an Aggregate node would
    // be an invalid plan, so any unmapped leaf poisons the rewrite
    if (!ok || outputs.exists(_.exists(
        _.isInstanceOf[AggregateExpression]))) None
    else Some(Project(outputs, projRel))
  }
}
