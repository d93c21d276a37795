package graft.tools

import graft.queries.Registry

/** Plan hygiene audit: for each (or one named) query, prints the
  * formatted physical plan and flags the properties that matter at
  * 100TB — filter/projection pushdown into the parquet scan, broadcast
  * vs shuffle joins, whole-stage codegen coverage.
  *
  * Usage: runMain graft.tools.PlanAudit [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("plan-audit", "4")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Registry.all.map(_.name)
    names.foreach { n =>
      val df = Registry.byName(n).run(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val flags = Seq(
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "SortMergeJoin" -> plan.contains("SortMergeJoin"),
        "NestedLoop" -> plan.contains("NestedLoop"),
        "WholeStageCodegen" -> (plan.contains("WholeStageCodegen") || plan.contains("*(")),
        "Exchange" -> plan.contains("Exchange"),
        "ReusedExchange" -> plan.contains("ReusedExchange"))
      println(s"== $n: " + flags.collect { case (k, true) => k }.mkString(", "))
      if (args.nonEmpty) {
        import org.apache.spark.sql.execution.debug._
        df.explain("formatted")
      }
    }
    spark.stop()
  }
}
