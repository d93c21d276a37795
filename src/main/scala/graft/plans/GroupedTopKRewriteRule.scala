package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: the canonical top-k-per-group pattern
  *
  * {{{ Project(cols without rn,
  *       Filter(rn <= k,
  *         Window([row_number() over (partition by g order by o) AS rn], g, o, child))) }}}
  *
  * becomes `Project(cols, GroupedTopKNode(g, o, k, child))` — bounded
  * heaps instead of a full per-group sort inside the window operator
  * (O(n log k) and k rows per group shuffled, vs O(n log n) and all
  * rows). Fires only when the rewrite is provably equivalent:
  * row_number (not rank/dense_rank — those can emit more than k rows
  * on ties), the standard rows-unbounded-preceding..current frame, a
  * non-empty partition spec (empty = global top-k, which Spark already
  * plans as TakeOrderedAndProject), the filter is exactly a bound on
  * the rank, and the rank column itself is projected away (the
  * operator does not produce it).
  *
  * Registered via GraftExtensions with [[GroupedTopKStrategy]], which
  * plans the node physically.
  */
object GroupedTopKRewriteRule extends Rule[LogicalPlan] {

  /** Matches the rank attribute, bare or behind the implicit
    * int→bigint cast type coercion inserts for `rn <= 3L` (SQL bigint
    * literals would otherwise silently skip the rewrite). */
  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    object R {
      def unapply(e: Expression): Boolean = e match {
        case a: Attribute => a.semanticEquals(rn)
        case Cast(a: Attribute, LongType, _, _) => a.semanticEquals(rn)
        case _ => false
      }
    }
    object K {
      def unapply(e: Expression): Option[Int] = e match {
        case Literal(k: Int, IntegerType) => Some(k)
        case Literal(k: Long, LongType) if k >= Int.MinValue && k <= Int.MaxValue => Some(k.toInt)
        case _ => None
      }
    }
    cond match {
      case LessThanOrEqual(R(), K(k)) => Some(k)
      case LessThan(R(), K(k)) => Some(k - 1)
      case EqualTo(R(), K(k)) if k == 1 => Some(1)
      case GreaterThanOrEqual(K(k), R()) => Some(k)
      case GreaterThan(K(k), R()) => Some(k - 1)
      case _ => None
    }
  }

  private def isRowNumberFrame(frame: WindowFrame): Boolean = frame match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList,
        Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(_, _, frame)), _)), partSpec, orderSpec, child, _)))
        if isRowNumberFrame(frame) && partSpec.nonEmpty &&
          rankLimit(cond, al.toAttribute).exists(_ > 0) &&
          !projectList.exists(_.references.contains(al.toAttribute)) =>
      val k = rankLimit(cond, al.toAttribute).get // same call as the guard
      Project(projectList, GroupedTopKNode(partSpec, orderSpec, k, child))
  }
}
