package graft

/** One execution of each registry query at sf0.001, shared by every
  * suite that needs the result (QueriesSmokeSpec's row counts) or the
  * executed plan (PlanInvariantsSpec's structural checks). The suites
  * previously each ran all ~194 queries — two full surface executions
  * per `sbt test` (~17 min of the suite's wall time); the per-query
  * memo keeps failure attribution (each test triggers only its own
  * query) while running each query exactly once per JVM. */
object ExecutedSurface {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]()

  /** (row count, executed-plan string after execution — AQE-final). */
  def apply(q: graft.queries.QueryDef): (Long, String) =
    cache.computeIfAbsent(q.name, _ => {
      val df = q.run(TestSession.spark, TestSession.sf0001)
      // collect() executes THIS Dataset's QueryExecution (count() would
      // plan a fresh pruned one and leave this AQE plan
      // isFinalPlan=false, codegen-unannotated); after execution the
      // adaptive plan prints its final form with `*(n)` codegen markers.
      val rows = df.collect().length.toLong
      (rows, df.queryExecution.executedPlan.toString)
    })
}
