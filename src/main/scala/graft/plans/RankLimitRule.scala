package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the idiomatic per-key top-k formulation
  *
  * {{{ Filter(rn <= k, Window(row_number() over (partition by K order by O), ...)) }}}
  *
  * into the bounded-heap [[TopKPerKeyNode]] feeding a residual Window over
  * the surviving ≤ k·|keys| rows:
  *
  * {{{ Filter(rn <= k, Window(rn, TopKPerKeyNode(child, K, O, k))) }}}
  *
  * The expensive full per-key sort (WindowExec sorts every group to rank
  * ALL rows, then the filter throws ranks > k away) collapses to one
  * O(n log k) heap pass; the residual Window re-derives row numbers over k
  * rows per key, and the retained Filter keeps the rewrite semantics-exact
  * even for conditions like `rn < 4` or when rn is projected downstream.
  *
  * Guarded to the cases where the heap provably matches row_number
  * semantics:
  *  - exactly one window expression, and it is `row_number()`
  *  - non-empty partition spec (a global top-k is `orderBy.limit`, which
  *    Spark already turns into TakeOrderedAndProject)
  *  - all sort directions equal, with default null ordering
  *  - literal integer bound with k ≥ 1
  *
  * Ties across the kept/dropped boundary are arbitrary in BOTH
  * formulations (row_number over a non-unique order is nondeterministic),
  * so the rewrite never widens the nondeterminism envelope.
  *
  * Spark's own InferWindowGroupLimit handles the same pattern by inserting
  * a WindowGroupLimit that still locally SORTS every group before and
  * after the shuffle; when one is present below the matched Window it is
  * stripped in favor of the sort-free heap.
  */
object RankLimitRule extends Rule[LogicalPlan] {

  private def rankBound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    // a conjunct bound is safe: the ORIGINAL filter stays above the heap
    // and re-applies every predicate (including the rank one), and the
    // window above the pruned child recomputes ranks 1..k identical to
    // the unpruned ranks — so extra conjuncts (e.g. `rn <= 3 AND n >= 20`)
    // only narrow the result further. An OR must NOT rewrite (a row past
    // rank k could still pass via the other disjunct), and `case _` below
    // keeps it declined.
    case And(l, r) => rankBound(l, rn).orElse(rankBound(r, rn))
    case _ => None
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case Literal(v: Long, _) if v.isValidInt => Some(v.toInt)
      case _ => None
    }
  }

  /** (order expression for the heap, keep-largest flag) when the sort spec
    * is uniform with default null ordering.
    */
  private def heapOrder(os: Seq[SortOrder]): Option[(Expression, Boolean)] = {
    val dirs = os.map(_.direction).distinct
    val defaultNulls = os.forall(s => s.nullOrdering == s.direction.defaultNullOrdering)
    // order expressions must be deterministic like the partition keys —
    // the rewrite re-evaluates them in the heap and in the residual window
    val allDeterministic = os.forall(_.child.deterministic)
    if (os.isEmpty || dirs.length != 1 || !defaultNulls || !allDeterministic) None
    else {
      val ord =
        if (os.length == 1) os.head.child
        else CreateStruct(os.map(_.child))
      // orderBy ASC ranks smallest first → keep the k SMALLEST
      Some((ord, dirs.head == Descending))
    }
  }

  private def rewrite(f: Filter, w: Window): Option[LogicalPlan] = w match {
    case Window(Seq(alias @ Alias(
          WindowExpression(_: RowNumber, WindowSpecDefinition(ps, os, _)), _)),
        _, _, child, _) if ps.nonEmpty =>
      // An InferWindowGroupLimit insertion below the window would re-sort
      // every group around the shuffle; the heap replaces it. (Later
      // optimizer iterations re-add the group limit above an existing
      // heap — over ≤ k rows per key, which is noise, but it means the
      // idempotence check must look through it.)
      val base = child match {
        case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
        case other => other
      }
      val alreadyRewritten = base match {
        case t: TopKPerKeyNode => t.keys == ps
        case _ => false
      }
      for {
        k <- rankBound(f.condition, alias.toAttribute)
        if k >= 1 && !alreadyRewritten
        (ord, largest) <- heapOrder(os)
        // partition keys must be plain deterministic expressions over the child
        if ps.forall(e => e.deterministic && e.references.subsetOf(base.outputSet))
      } yield {
        val topk = TopKPerKeyNode(base, ps, ord, k, largest)
        f.copy(child = w.copy(child = topk))
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // The filter usually sits directly on the window (predicates push
    // below projections); a pass-through Project in between is kept as-is.
    case f @ Filter(_, w: Window) =>
      rewrite(f, w).getOrElse(f)
    case f @ Filter(_, p @ Project(_, w: Window))
        if p.projectList.forall(_.isInstanceOf[Attribute]) =>
      rewrite(f.copy(child = w), w)
        .map { case rewritten: Filter => f.copy(child = p.copy(child = rewritten.child)) }
        .getOrElse(f)
  }
}
