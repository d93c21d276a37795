package graft.tools

import org.apache.spark.sql.functions._

/** One-shot exploration: can the state data source read a BUILT-IN
  * `groupBy(session_window(ts, gap), key).agg(...)` checkpoint into
  * plain columns — i.e. is the session-window savepoint-import
  * residual (SURVEY §7.4.5) actually closable like the tumbling/
  * sliding cases were in round 4? Prints the state schema and rows
  * mid-accumulation (open sessions) so the layout can be judged. */
object SessionStateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("session-state-probe", cpus = "4")
    graft.Engine.useRocksDBStateStore(spark)
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val ck = java.nio.file.Files.createTempDirectory("graft-sess-probe").toString
    val in = MemoryStream[(String, java.sql.Timestamp, Double)]
    val agg = in.toDF().toDF("k", "ts", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), "30 seconds"), col("k"))
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"))
    val q = agg.writeStream.format("noop")
      .option("checkpointLocation", ck)
      .outputMode("append").start()
    val base = 1700000000000L
    in.addData(
      ("a", new java.sql.Timestamp(base), 1.0),
      ("a", new java.sql.Timestamp(base + 5000), 2.0),
      ("b", new java.sql.Timestamp(base + 1000), 10.0))
    q.processAllAvailable()
    in.addData(("a", new java.sql.Timestamp(base + 20000), 4.0))
    q.processAllAvailable()
    q.stop()

    val st = spark.read.format("statestore").load(ck)
    println("== state schema ==")
    st.printSchema()
    println("== state rows ==")
    st.show(50, truncate = false)
    spark.stop()
  }
}
