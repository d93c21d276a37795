package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.SparkSession

/** Grouped top-k as a first-class operator (SURVEY §4's "custom
  * LogicalPlan + Strategy + SparkPlan" slot — the one whole-operator
  * semantic Spark lacks a physical operator for).
  *
  * `SELECT ... QUALIFY row_number() OVER (PARTITION BY g ORDER BY o) <= k`
  * is planned by Spark as a full sort of every group inside a window
  * operator — O(n log n) per group, all rows shuffled. This operator
  * keeps a bounded k-element heap per group: per-partition partial
  * top-k (map side), shuffle of at most k rows per (partition, group),
  * then a final top-k per group — O(n log k), k rows per group
  * shuffled. Same two-phase shape as TakeOrderedAndProject, generalized
  * to grouping keys.
  *
  * Rows equal under the full `ordering` beyond position k are dropped
  * arbitrarily — supply a unique tiebreaker column (as every
  * deterministic top-k should) for stable output.
  *
  * Memory: each task holds (groups-in-partition × k) retained rows on
  * heap with no spill path — bounded and small for the top-k shapes
  * this targets (k ≪ group size), but a very high-cardinality group
  * key with large k belongs in the window/sort operator (which spills)
  * instead.
  */
final case class GroupedTopKNode(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

/** Planner strategy: two-phase physical plan; EnsureRequirements adds
  * the group-key exchange between partial and final. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(group, order, k, child) =>
      val partial = GroupedTopKExec(group, order, k, partial = true, planLater(child))
      GroupedTopKExec(group, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

final case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupSchema = groupExprs
    val order = ordering
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupSchema, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput.map(e => e: Expression), childOutput)
      val cmp = GenerateOrdering.generate(
        order.map(BindReferences.bindReference(_, childOutput)))
      // heap head = worst retained row (reverse of the sort order)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val heapCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmp.compare(b, a)
      }
      while (iter.hasNext) {
        val row = iter.next() match {
          case u: UnsafeRow => u
          case r => toUnsafe(r)
        }
        val key = groupProj.apply(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
        } else if (cmp.compare(row, heap.peek()) < 0) { // row sorts before worst
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopK {
  /** Public API: top-k rows per group. `orderSpec` is (column,
    * descending) pairs — include a unique tiebreaker for deterministic
    * output. Names resolve against the analyzed plan directly (the
    * Column DSL's sort nodes are lazy connect-layer wrappers that
    * neither serialize nor pattern-match as catalyst SortOrder). */
  def apply(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String], k: Int,
            orderSpec: Seq[(String, Boolean)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    import org.apache.spark.sql.graftshim.Shim
    require(k > 0, s"GroupedTopK: k must be positive, got $k")
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${plan.output.map(_.name)}"))
    val order = orderSpec.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    Shim.ofRows(df.sparkSession,
      GroupedTopKNode(groupCols.map(attr), order, k, plan))
  }
}
