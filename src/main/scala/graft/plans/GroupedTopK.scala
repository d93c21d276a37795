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
  * Memory: each task retains at most `spark.graft.topk.maxRetainedRows`
  * (default 4M) heap rows. Past the budget the operator degrades
  * gracefully instead of OOMing on high-cardinality group keys:
  *  - the partial (map-side) phase stops admitting NEW groups and passes
  *    their rows through unfiltered — semantically free, since the final
  *    phase is exact regardless of what the partial pruned;
  *  - the final phase dumps its heaps plus the remaining input into a
  *    spillable external sorter ordered by (group, ordering) and streams
  *    the first k rows of each sorted group — the same spill behavior
  *    the window/sort plan would have, without giving up the map-side
  *    pruning already done.
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

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numPassThroughRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows passed through on partial budget breach"),
    "numSortFallbacks" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "partitions falling back to spillable sort"))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupSchema = groupExprs
    val order = ordering
    val limit = k
    val childOutput = child.output
    val isPartial = partial
    val maxRetained = math.max(limit.toLong,
      conf.getConfString("spark.graft.topk.maxRetainedRows", (4 << 20).toString).toLong)
    val passThroughMetric = longMetric("numPassThroughRows")
    val sortFallbackMetric = longMetric("numSortFallbacks")
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
      val maxGroups = math.max(1L, maxRetained / limit)
      import scala.jdk.CollectionConverters._

      def flushHeaps(): Iterator[InternalRow] =
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)

      /** Absorb into the group's heap; true when the row was consumed,
        * false when the group budget is exhausted (caller decides). */
      def absorb(row: UnsafeRow): Boolean = {
        val key = groupProj.apply(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxGroups) return false
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
        } else if (cmp.compare(row, heap.peek()) < 0) { // row sorts before worst
          heap.poll()
          heap.add(row.copy())
        }
        true
      }

      val unsafeIter = iter.map {
        case u: UnsafeRow => u
        case r => toUnsafe(r)
      }

      if (isPartial) {
        // Map side: rows of groups beyond the budget stream through
        // unfiltered (the exact final phase prunes them); tracked groups
        // keep their bounded heaps. Lazy suffix flushes the heaps only
        // after the input is exhausted.
        unsafeIter.flatMap { row =>
          if (absorb(row)) Iterator.empty
          else { passThroughMetric.add(1); Iterator.single(row.copy(): InternalRow) }
        } ++ flushHeaps()
      } else {
        // Reduce side: absorb until the budget trips, then dump heaps +
        // the tripping row + remaining input into a spillable sort on
        // (group, ordering) and stream the first k rows per sorted group.
        var breached = false
        var tripped: UnsafeRow = null
        while (unsafeIter.hasNext && !breached) {
          val row = unsafeIter.next()
          if (!absorb(row)) { breached = true; tripped = row.copy() }
        }
        if (!breached) flushHeaps()
        else {
          sortFallbackMetric.add(1)
          val groupSort = groupSchema.map(e =>
            SortOrder(BindReferences.bindReference(e, childOutput),
              org.apache.spark.sql.catalyst.expressions.Ascending))
          val fullSort = groupSort ++ order.map(BindReferences.bindReference(_, childOutput))
          val sorter = org.apache.spark.sql.graftshim.Shim.rowSorter(
            org.apache.spark.sql.graftshim.Shim.schemaOf(childOutput),
            GenerateOrdering.generate(fullSort))
          sorter.insertRow(tripped)
          flushHeaps().foreach(r => sorter.insertRow(r.asInstanceOf[UnsafeRow]))
          heaps.clear()
          val sorted = sorter.sort(unsafeIter)
          var curKey: UnsafeRow = null
          var emitted = 0
          sorted.filter { r =>
            val key = groupProj.apply(r.asInstanceOf[UnsafeRow])
            if (curKey == null || key != curKey) { curKey = key.copy(); emitted = 0 }
            emitted += 1
            emitted <= limit
          }
        }
      }
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
