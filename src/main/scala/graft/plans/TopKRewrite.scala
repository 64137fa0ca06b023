package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite for the universal top-k idiom:
  *
  * {{{
  *   Project [cols not using rn]
  *     Filter (rn <= k)                       // or rn < k+1, rn = 1
  *       Window [row_number() ... AS rn] partitionBy keys orderBy ord
  * }}}
  *
  * becomes [[TopKPerKeyPlan]] — the bounded-heap physical operator
  * (O(n log k), two-phase with map-side combine) instead of a FULL
  * per-key sort that discards everything past row k. Users keep
  * writing the idiomatic window form (or inherit it from ported SQL
  * `QUALIFY` queries); the plan they get is the one they'd want.
  *
  * Fires only when the rewrite is unobservable:
  *  - the single window function is `row_number()` with its default
  *    running frame;
  *  - the filter references ONLY the rank and compares against a
  *    foldable non-negative bound;
  *  - the projection above DROPS the rank column, so the missing rank
  *    values cannot be seen (a query that selects `rn` keeps the
  *    window plan).
  *
  * Output ROW ORDER within a key changes (heap order vs sorted) —
  * like any aggregate rewrite this is unobservable in the unordered
  * DataFrame model; the physical node declares no outputOrdering, so
  * any downstream order requirement still inserts its sort.
  *
  * Ties: when the window ordering is not a total order, `row_number`
  * itself is NONDETERMINISTIC at the k boundary (which tied row ranks
  * k vs k+1 depends on partitioning and physical row order), and the
  * heap operator may select a different tied row than a given window
  * execution would — the same contract, a different draw. Spark's own
  * InferWindowGroupLimit makes the identical trade. Queries that need
  * a stable winner must make the ordering total (add a tiebreaker
  * column), with or without this rewrite.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** Extract k from a rank predicate, normalized to `rank <= k`. */
  private def boundOf(cond: Expression, rn: Attribute): Option[Int] = {
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _)  => Some(v)
      case Literal(v: Long, _) if v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
    def isRn(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == rn.exprId
      case _ => false
    }
    cond match {
      case LessThanOrEqual(a, l) if isRn(a) => lit(l)
      case LessThan(a, l) if isRn(a)        => lit(l).map(_ - 1)
      case EqualTo(a, l) if isRn(a)         => lit(l).filter(_ == 1)
      case EqualTo(l, a) if isRn(a)         => lit(l).filter(_ == 1)
      case GreaterThanOrEqual(l, a) if isRn(a) => lit(l)
      case GreaterThan(l, a) if isRn(a)     => lit(l).map(_ - 1)
      case _ => None
    }
  }

  private def rowNumberAlias(exprs: Seq[NamedExpression]): Option[Alias] =
    exprs match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(
            RowFrame, UnboundedPreceding, CurrentRow))), _)) => Some(a)
      case _ => None
    }

  /** Session kill-switch (`spark.graft.topk.rewrite=false`) — for
    * A/B-ing against the window plan and as an escape hatch. */
  val EnabledConf = "spark.graft.topk.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledConf, "true").toBoolean) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        Filter(cond, w @ Window(windowExprs, partSpec, ordSpec, wChild, _)))
        if partSpec.nonEmpty && ordSpec.nonEmpty =>
      (for {
        rnAlias <- rowNumberAlias(windowExprs)
        rn = rnAlias.toAttribute
        k <- boundOf(cond, rn)
        if k > 0
        // the rank must be DISCARDED above and the filter must test
        // nothing else; all remaining references resolve to the child
        if !projectList.exists(_.references.contains(rn))
        if cond.references.subsetOf(AttributeSet(Seq(rn)))
        if projectList.forall(_.references.subsetOf(wChild.outputSet))
      } yield {
        val spill = conf.getConfString(TopK.SpillThresholdConf,
          TopK.DefaultSpillThreshold.toString).toLong
        Project(projectList,
          TopKPerKeyPlan(partSpec, ordSpec, k, spill,
            stripGroupLimit(wChild))): LogicalPlan
      }).getOrElse(p)
  }

  /** Spark's own InferWindowGroupLimit (3.5+) may already have inserted
    * a WindowGroupLimit prefilter below the window by the time user
    * rules run; the heap operator subsumes it (its partial phase IS a
    * group limit), so unwrap to avoid a redundant per-partition pass. */
  private[plans] def stripGroupLimit(plan: LogicalPlan): LogicalPlan = plan match {
    case org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit(
        _, _, _, _, child) => child
    case other => other
  }
}
