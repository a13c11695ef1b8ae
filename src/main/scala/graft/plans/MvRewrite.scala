package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** MATERIALIZED-VIEW-aware query rewrite — the optimizer half of the
  * IVM story. The `graft.cdc.Incremental*` family keeps aggregate views
  * fresh in O(Δ); this rule makes queries USE them transparently: a
  * logical plan that aggregates the base table in exactly the shape a
  * registered MV materializes is rewritten to scan the MV instead — the
  * Calcite/Materialize "query routing" capability, expressed as a
  * Catalyst `Rule[LogicalPlan]`.
  *
  * This is the one place the library injects plan machinery (the
  * preference ladder's third rung): transparent routing is an
  * OPTIMIZER-LEVEL semantic no composition of built-in operators can
  * express — the whole point is that the USER'S plan doesn't change.
  * Everything else in the engine stays on the built-in algebra.
  *
  * Matching is deliberately EXACT and conservative (v1): an
  * `Aggregate` whose grouping expressions are bare attributes equal to
  * the registration's `groupCols` (same order), whose aggregate
  * functions are non-distinct `count(1)` / `sum(attr)` equal to the
  * registration's `aggSpecs` (same order), sitting directly on (or on
  * an attribute-only `Project` of) a parquet relation whose root path
  * contains `baseTag`. Any filter, expression-bearing projection
  * (casts included), distinct flag, or extra operator between the
  * aggregate and the scan disqualifies — a conservative miss costs
  * only the base-table recompute, while a false match would corrupt
  * results, so every non-trivial shape misses.
  *
  * The rewrite preserves the original output attributes exactly: each
  * MV column (written positionally as groupCols ++ agg outputs) is
  * aliased back to the matched aggregate's output name AND exprId, so
  * parent operators rebind without analysis changes.
  *
  * SEMANTICS CONTRACT: the registered MV must hold exactly the rows
  * the registered aggregate produces over the CURRENT base — keeping
  * that true under change streams is what the incremental maintenance
  * operators are for. The gate (`q_cdc_mv_rewrite`) hash-checks the
  * rewritten query against a DuckDB oracle computing from the BASE
  * table, so a stale or wrong MV fails correctness, and an in-gate
  * `require` fails loudly if the rewrite did not fire (a silent
  * fall-through to the base scan must not masquerade as a pass).
  *
  * Scale shape: the rewrite replaces an O(base) scan + shuffle with an
  * O(groups) MV read — at 100 TB this is the difference between a full
  * fact-table aggregation and a metadata-sized lookup, and the MV
  * stays fresh for O(Δ) per batch via the IVM operators.
  */
object MvRewrite {

  /** One registered view: `baseTag` identifies the base parquet path
    * (substring of a root path), `groupCols`/`aggSpecs` the exact
    * aggregate shape ((func, input-column) with None = count(1)), `mv`
    * a thunk producing a fresh scan of the materialized data whose
    * columns are positionally groupCols ++ agg outputs.
    */
  final case class Registration(baseTag: String, groupCols: Seq[String],
      aggSpecs: Seq[(String, Option[String])], mv: () => DataFrame)

  /** Global enable switch: the gate flips it off while (re)building the
    * MV — the build query itself matches the registered shape, and
    * rewriting it would read the very files it is about to overwrite.
    */
  @volatile var enabled: Boolean = true

  final class RewriteRule(reg: Registration) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (!enabled) plan
      else plan.transformUp {
        case agg: Aggregate if matches(agg) => rewrite(agg)
      }

    private def baseMatches(p: LogicalPlan): Boolean = p match {
      // attribute-only projections (column pruning) are transparent;
      // anything expression-bearing (casts, renames) disqualifies
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        baseMatches(child)
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toString.contains(reg.baseTag))
        case _ => false
      }
      case _ => false
    }

    private def matches(agg: Aggregate): Boolean = {
      if (!baseMatches(agg.child)) return false
      val gnames = agg.groupingExpressions.map {
        case a: AttributeReference => a.name
        case _ => return false
      }
      if (gnames != reg.groupCols) return false
      val named = agg.aggregateExpressions
      val aggFns = named.collect {
        case Alias(ae: AggregateExpression, _) => ae
      }
      // output must be exactly the groupings plus the aggregate aliases
      if (aggFns.length + reg.groupCols.length != named.length) return false
      val specs: Seq[(String, Option[String])] = aggFns.map { ae =>
        if (ae.isDistinct || ae.filter.isDefined) return false
        ae.aggregateFunction match {
          case c: Count => c.children match {
            case Seq(Literal(1, _)) => ("count", None)
            case _ => return false
          }
          case s: Sum => s.child match {
            case a: AttributeReference => ("sum", Some(a.name))
            case _ => return false
          }
          case _ => return false
        }
      }
      specs == reg.aggSpecs
    }

    private def rewrite(agg: Aggregate): LogicalPlan = {
      val mvPlan = reg.mv().queryExecution.analyzed
      val out = agg.output
      require(mvPlan.output.length == out.length,
        s"MV width ${mvPlan.output.length} != aggregate width ${out.length}")
      val aliased: Seq[NamedExpression] = out.zip(mvPlan.output).map {
        case (o, m) => Alias(m, o.name)(exprId = o.exprId,
          qualifier = o.qualifier)
      }
      Project(aliased, mvPlan)
    }
  }

  /** Idempotently install the rule on a session's user-provided
    * optimizer slot (assignment, not append — re-running the gate in
    * one JVM must not stack rules).
    */
  def install(spark: org.apache.spark.sql.SparkSession,
      reg: Registration): Unit =
    spark.experimental.extraOptimizations = Seq(new RewriteRule(reg))
}
