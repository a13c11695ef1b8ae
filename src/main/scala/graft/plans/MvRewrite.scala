package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** MATERIALIZED-VIEW-aware query rewrite — the optimizer half of the
  * IVM story. The `graft.cdc.Incremental*` family keeps aggregate views
  * fresh in O(Δ); this rule makes queries USE them transparently: a
  * logical plan that aggregates the base table in a shape the
  * registered MV SUBSUMES is rewritten to read the MV instead — the
  * Calcite/Materialize "query routing" capability, expressed as a
  * Catalyst `Rule[LogicalPlan]`.
  *
  * This is the one place the library injects plan machinery (the
  * preference ladder's third rung): transparent routing is an
  * OPTIMIZER-LEVEL semantic no composition of built-in operators can
  * express — the whole point is that the USER'S plan doesn't change.
  * Everything else in the engine stays on the built-in algebra.
  *
  * Three subsumption cases, each value-exact by a stated theorem:
  *
  *  1. EXACT — same groupings (same order), same aggregate list:
  *     replace with the MV scan.
  *  2. FILTER on group columns — `σ_p(base)` then the registered
  *     aggregate, where p references ONLY group columns: groups are
  *     p-homogeneous (every row of a group shares its group values), so
  *     filtering rows before aggregation equals filtering GROUPS after:
  *     rewrite to `σ_p(MV)`.
  *  3. ROLLUP to a grouping SUBSET — count(1) re-aggregates as
  *     `sum(n)`, `sum(x)` as `sum(sx)`, both by associativity of + over
  *     the partition refinement: rewrite to `Aggregate(subset, MV)` —
  *     O(groups) input instead of O(base). Composes with case 2.
  *
  * Matching is deliberately conservative: bare-attribute groupings,
  * non-distinct `count(1)` / `sum(attr)` drawn from the registration's
  * aggregate list, attribute-only projections, at most one filter whose
  * references are all group columns, down to a parquet relation whose
  * root path contains `baseTag`. Anything else — expression groupings,
  * casts, avg/min/max, filters touching the metric, distinct — misses:
  * a conservative miss costs only the base-table recompute, while a
  * false match would corrupt results.
  *
  * The rewrite preserves the original output attributes exactly: every
  * produced column is aliased back to the matched aggregate's output
  * name AND exprId, so parent operators rebind without analysis
  * changes.
  *
  * SEMANTICS CONTRACT: the registered MV must hold exactly the rows the
  * registered aggregate produces over the CURRENT base — keeping that
  * true under change streams is what the incremental maintenance
  * operators are for. The gates (`q_cdc_mv_rewrite`,
  * `q_cdc_mv_rollup`) hash-check rewritten queries against DuckDB
  * oracles computing from the BASE table, and `require` loudly that the
  * rewrite fired (a silent fall-through to the base scan must not
  * masquerade as a pass).
  *
  * Scale shape: the rewrite replaces an O(base) scan + shuffle with an
  * O(groups) MV read (plus an O(groups) re-aggregation in the rollup
  * case) — at 100 TB this is the difference between a full fact-table
  * aggregation and a metadata-sized lookup, and the MV stays fresh for
  * O(Δ) per batch via the IVM operators.
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

  /** A matched aggregate, decomposed positionally: one layout entry per
    * output column — Left(groupColName) for grouping passthroughs,
    * Right(aggSpec) for aggregate aliases — plus the optional
    * group-column filter predicate from the base side. Positional
    * layout makes the rewrite immune to interleaved SELECT orders and
    * to aggregate aliases that happen to reuse a group column's name.
    */
  private final case class Match(groupNames: Seq[String],
      layout: Seq[Either[String, (String, Option[String])]],
      filter: Option[Expression])

  final class RewriteRule(reg: Registration) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (!enabled) plan
      else plan.transformUp {
        case agg: Aggregate =>
          analyze(agg).map(rewrite(agg, _)).getOrElse(agg)
      }

    /** Walk the aggregate's child: attribute-only projections are
      * transparent, at most ONE filter (kept only if every reference is
      * a registered group column), ending at the tagged parquet
      * relation. Returns the filter if the chain qualifies.
      */
    private def baseChain(p: LogicalPlan): Option[Option[Expression]] =
      p match {
        case Project(projList, child)
            if projList.forall(_.isInstanceOf[AttributeReference]) =>
          baseChain(child)
        case Filter(cond, child)
            if cond.references.forall(a =>
              reg.groupCols.contains(a.name)) =>
          baseChain(child).flatMap {
            case None => Some(Some(cond))
            case Some(_) => None // two filters: out of scope, miss
          }
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation
              if fs.location.rootPaths
                .exists(_.toString.contains(reg.baseTag)) =>
            Some(None)
          case _ => None
        }
        case _ => None
      }

    private def analyze(agg: Aggregate): Option[Match] = {
      val filterOpt = baseChain(agg.child).getOrElse(return None)
      val gnames = agg.groupingExpressions.map {
        case a: AttributeReference => a.name
        case _ => return None
      }
      // groupings must draw from the registered group columns (equal
      // list = exact/filter case; subset = rollup), no duplicates
      if (gnames.distinct != gnames ||
        !gnames.forall(reg.groupCols.contains)) return None
      val layout: Seq[Either[String, (String, Option[String])]] =
        agg.aggregateExpressions.map {
          case a: AttributeReference if gnames.contains(a.name) =>
            Left(a.name)
          case Alias(ae: AggregateExpression, _) =>
            if (ae.isDistinct || ae.filter.isDefined) return None
            ae.aggregateFunction match {
              case c: Count => c.children match {
                case Seq(Literal(1, _)) => Right(("count", None))
                case _ => return None
              }
              case s: Sum => s.child match {
                case a: AttributeReference => Right(("sum", Some(a.name)))
                case _ => return None
              }
              case _ => return None
            }
          case _ => return None
        }
      // every requested aggregate must exist in the registration
      if (!layout.forall {
        case Right(spec) => reg.aggSpecs.contains(spec)
        case Left(_) => true
      }) return None
      Some(Match(gnames, layout, filterOpt))
    }

    /** MV attributes by registration position: groupCols then aggs. */
    private def mvAttrs(mvPlan: LogicalPlan)
        : (Map[String, Attribute], Seq[Attribute]) = {
      val out = mvPlan.output
      require(out.length == reg.groupCols.length + reg.aggSpecs.length,
        s"MV width ${out.length} != registration width")
      (reg.groupCols.zip(out).toMap, out.drop(reg.groupCols.length))
    }

    private def rewrite(agg: Aggregate, m: Match): LogicalPlan = {
      val mvPlan = reg.mv().queryExecution.analyzed
      val (groupAttr, aggAttrs) = mvAttrs(mvPlan)
      def mvAggAttr(spec: (String, Option[String])): Attribute =
        aggAttrs(reg.aggSpecs.indexOf(spec))
      // optional group-column filter, rebound onto the MV's attributes
      val filtered: LogicalPlan = m.filter match {
        case Some(cond) => Filter(cond.transform {
          case a: AttributeReference => groupAttr(a.name)
        }, mvPlan)
        case None => mvPlan
      }
      val out = agg.output
      val replacement: Seq[(Attribute, Expression)] =
        if (m.groupNames == reg.groupCols)
          // exact groupings (filter already applied): MV columns map
          // positionally back onto the query's own output layout
          out.zip(m.layout).map {
            case (o, Left(g)) => (o, groupAttr(g))
            case (o, Right(spec)) => (o, mvAggAttr(spec))
          }
        else
          // rollup to a grouping subset: count(1) folds as sum(n),
          // sum(x) as sum(sx) — associativity over the refinement
          out.zip(m.layout).map {
            case (o, Left(g)) => (o, groupAttr(g))
            case (o, Right(spec)) =>
              (o, AggregateExpression(Sum(mvAggAttr(spec)), Complete,
                isDistinct = false))
          }
      // type guard: re-summing widens some types (decimal sums gain
      // precision), which would break downstream binding — bail to the
      // base plan rather than emit a type-shifted column
      if (replacement.exists { case (o, e) => e.dataType != o.dataType })
        return agg
      val aliased: Seq[NamedExpression] = replacement.map { case (o, e) =>
        Alias(e, o.name)(exprId = o.exprId, qualifier = o.qualifier)
      }
      if (m.groupNames == reg.groupCols) Project(aliased, filtered)
      else Aggregate(m.groupNames.map(groupAttr), aliased, filtered)
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
