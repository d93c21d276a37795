package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dump `.explain("formatted")` (initial plan) plus the post-execution
  * adaptive plan for named registry queries — the before/after evidence
  * files the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.DumpPlans <outDir> <suffix> name…
  * Writes `<outDir>/<name>_<suffix>.txt`.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.session("dump-plans")
    java.nio.file.Files.createDirectories(outDir)

    // capture the executed (AQE-final) plan of the noop write — and ONLY
    // it: several registry queries run intermediate actions inside their
    // builders (require()/count/localCheckpoint), whose async
    // QueryExecution events could otherwise race the save's and be
    // committed as bogus "AQE final" evidence. Accept only `save` events
    // whose executed plan is the noop write itself.
    @volatile var lastQe: QueryExecution = null
    // SPARK_GRAFT_DUMP_ALL=1 additionally appends every intermediate
    // action's executed plan: queries whose builders run eager actions
    // (localCheckpoint, count) do their join work there, invisible in
    // the final noop-write plan
    val dumpAll = sys.env.contains("SPARK_GRAFT_DUMP_ALL")
    val allPlans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        // discriminate on the plan itself (the only noop write in a dump
        // run is ours); funcName is command-shaped in Spark 4, not "save"
        if (qe.executedPlan.toString.contains("NoopWrite"))
          lastQe = qe
        else if (dumpAll) allPlans.add(qe.executedPlan.toString)
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })

    names.foreach { n =>
      try {
        allPlans.clear()
        val df = graft.queries.Registry.byName(n).run(spark, sfDir)
        val initial = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        lastQe = null
        df.write.format("noop").mode("overwrite").save()
        // QueryExecutionListener delivery is async on the listener bus
        var waited = 0
        while (lastQe == null && waited < 5000) { Thread.sleep(50); waited += 50 }
        val fin =
          if (lastQe != null) lastQe.executedPlan.toString
          else "(executed plan not captured)"
        val inter =
          if (dumpAll) {
            import scala.jdk.CollectionConverters._
            allPlans.iterator.asScala.zipWithIndex
              .map { case (p, i) => s"== intermediate action $i ==\n$p" }
              .mkString("\n\n", "\n\n", "")
          } else ""
        val txt = s"== initial (explain formatted) ==\n$initial\n\n== executed (AQE final) ==\n$fin\n$inter"
        java.nio.file.Files.write(
          outDir.resolve(s"${n}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plans] wrote ${n}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] $n FAILED: ${e.getMessage}")
      }
    }
    Runtime.getRuntime.halt(0)
  }
}
