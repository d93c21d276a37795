package graft

import org.apache.spark.sql.SparkSession

/** Minimal job CLI (SURVEY §3.1): the reference's CliFrontend actions
  * (`run / list / info / stop` —
  * ExecutionEnviromentreadTextFile创建DataSource分析.md:349-375) mapped
  * onto SparkSession + StreamingQueryManager. Submission machinery
  * (jar upload, cluster deploy) is spark-submit's job, not ours.
  *
  * Usage:
  *   run <queryName> <sfDir>   — run a registered query, print rows
  *   list                      — list registered queries
  *   info <queryName>          — print the optimized plan
  *   streams                   — list active streaming queries
  *   stop <streamName>         — stop an active streaming query
  *   cancel <streamName>       — alias of stop (microbatch queries always
  *                               retain their checkpoint; the reference's
  *                               stop-with-savepoint / cancel-without
  *                               distinction collapses — restart from the
  *                               checkpoint IS the savepoint restore)
  *   savepoint <ckptDir> <out> — export a checkpoint's keyed state to
  *                               parquet (ACTION_SAVEPOINT,
  *                               …DataSource分析.md:363-371): portable,
  *                               schema'd, re-importable via
  *                               Streams.importState
  *
  * `streams`/`stop` act on the CURRENT JVM's session (embedded use —
  * call EngineCli.main from the job driver); sessions in other
  * processes are out of scope, as in the reference's CLI, which talks
  * to its own cluster client.
  */
object EngineCli {
  def main(args: Array[String]): Unit = args.toList match {
    case "list" :: Nil =>
      queries.Registry.all.foreach(q =>
        println(f"${q.name}%-24s oracle=${q.oracle.isDefined}%-5s bench=${q.bench}"))
    case "run" :: name :: sfDir :: Nil =>
      withSession { spark => queries.Registry.byName(name).run(spark, sfDir).show(50, truncate = false) }
    case "info" :: name :: Nil =>
      withSession { spark =>
        queries.Registry.byName(name).run(spark, "/root/testdata/sf0.001").explain("formatted")
      }
    case "streams" :: Nil =>
      withSession { spark => spark.streams.active.foreach(q => println(s"${q.name} ${q.id} ${q.status}")) }
    case ("stop" | "cancel") :: name :: Nil =>
      withSession { spark => spark.streams.active.filter(_.name == name).foreach(_.stop()) }
    case "savepoint" :: ckpt :: out :: Nil =>
      withSession { spark =>
        streaming.Streams.exportState(spark, ckpt, out)
        println(s"state exported: $ckpt -> $out")
      }
    case other =>
      System.err.println(
        s"unknown command: ${other.mkString(" ")} (run|list|info|streams|stop|cancel|savepoint)")
      sys.exit(2)
  }

  private def withSession(f: SparkSession => Unit): Unit = {
    val spark = Engine.session("graft-cli")
    try f(spark) finally spark.stop()
  }
}
