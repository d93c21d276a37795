package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.GroupedTopK

/** The custom grouped-top-k physical operator vs the window-function
  * formulation it replaces. */
class GroupedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private lazy val orders = graft.sources.Tables(spark, TestSession.sf0001).orders.cache()

  /** Genuine window-operator baseline: rn stays in the projection so
    * GroupedTopKRewriteRule cannot fire on it (it only rewrites when
    * the rank column is projected away) — this must execute Spark's
    * own window operator, never the operator under test. */
  private def windowTopK(k: Int): Set[(Long, Long)] = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "rn")
    assert(!df.queryExecution.optimizedPlan.toString.contains("GroupedTopKNode"),
      "baseline was rewritten — it is no longer a window-operator baseline")
    // collect WITH rn: a select dropping it here would re-create the
    // exact pattern the rewrite rule matches
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("matches window row_number top-k (unique tiebreaker)") {
    val got = GroupedTopK(orders, Seq("o_custkey"), 3,
      Seq(("o_totalprice", true), ("o_orderkey", false)))
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == windowTopK(3))
  }

  test("k larger than any group returns everything") {
    val got = GroupedTopK(orders, Seq("o_custkey"), 1000,
      Seq(("o_totalprice", true), ("o_orderkey", false))).count()
    assert(got == orders.count())
  }

  test("plans as two-phase GroupedTopKExec with one exchange, no sort") {
    val df = GroupedTopK(orders, Seq("o_custkey"), 3,
      Seq(("o_totalprice", true), ("o_orderkey", false)))
    val plan = df.queryExecution.executedPlan.toString
    assert("GroupedTopK \\[".r.findAllIn(plan).length == 2, s"plan:\n$plan")
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
    assert(plan.contains("Exchange"), s"missing group exchange:\n$plan")
  }

  test("composes with downstream operators") {
    val top = GroupedTopK(orders, Seq("o_custkey"), 2,
      Seq(("o_totalprice", true), ("o_orderkey", false)))
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    assert(top.filter(col("n") > 2).count() == 0)
  }

  test("rewrite rule turns row_number-filter-drop into GroupedTopK") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val q = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")
    assert(q.queryExecution.optimizedPlan.toString.contains("GroupedTopKNode"),
      s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
    val got = q.select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == windowTopK(3))
  }

  test("high-cardinality group key under a tiny retained-rows budget: falls back, stays exact") {
    // every o_orderkey is its own group (~7.5k groups at sf0.001): with
    // maxRetainedRows=64 both phases trip their budgets — the partial
    // phase passes rows through, the final phase takes the spillable
    // sort path — and the result must still equal the window plan's.
    spark.conf.set("spark.graft.topk.maxRetainedRows", "64")
    try {
      val top = graft.plans.GroupedTopK(orders, Seq("o_orderkey"), 1,
        Seq(("o_totalprice", true), ("o_orderkey", false)))
      // collect `top` itself: a .select() would wrap it in a NEW
      // QueryExecution and the metrics we inspect below would belong to
      // a never-executed plan copy
      val got = top.collect()
        .map(r => (r.getLong(r.fieldIndex("o_orderkey")), r.getDouble(r.fieldIndex("o_totalprice")))).toSet
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val want = orders.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("o_orderkey", "o_totalprice").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == want, s"fallback path diverged: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
      // prove the degraded paths actually ran (not a vacuous pass)
      def findTopK(p: org.apache.spark.sql.execution.SparkPlan): Seq[graft.plans.GroupedTopKExec] =
        p.flatMap {
          case g: graft.plans.GroupedTopKExec => Seq(g)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => findTopK(s.plan)
          case _ => Nil
        }
      val execs = top.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => findTopK(a.executedPlan)
        case p => findTopK(p)
      }
      assert(execs.nonEmpty)
      val passThrough = execs.map(_.metrics("numPassThroughRows").value).sum
      val sortFallbacks = execs.map(_.metrics("numSortFallbacks").value).sum
      assert(passThrough > 0, "partial phase never hit its budget")
      assert(sortFallbacks > 0, "final phase never took the spillable-sort path")
    } finally spark.conf.unset("spark.graft.topk.maxRetainedRows")
  }

  test("rewrite rule fires on a bigint rank bound (rn <= 3L)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // type coercion wraps rn in a cast to bigint — the rule must still match
    val q = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= lit(3L))
      .drop("rn")
    assert(q.queryExecution.optimizedPlan.toString.contains("GroupedTopKNode"),
      s"rewrite did not fire on Long literal:\n${q.queryExecution.optimizedPlan}")
    val got = q.select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == windowTopK(3))
  }

  test("rewrite rule does NOT fire when the rank column survives or for rank()") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val keepsRank = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(!keepsRank.queryExecution.optimizedPlan.toString.contains("GroupedTopKNode"))
    val rankNotRowNumber = orders.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(!rankNotRowNumber.queryExecution.optimizedPlan.toString.contains("GroupedTopKNode"))
  }
}
