package graft.tools

import org.apache.spark.sql.functions._

/** Boundary probe: does the BUILT-IN session aggregate keep a row whose
  * event time is behind the watermark but whose candidate session
  * [t, t+gap) still ends after it? (Determines sessionAggTws's late
  * filter: raw-timestamp vs session-end semantics.) */
object SessionLateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("session-late-probe", cpus = "4")
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    // gap 2 minutes, watermark delay 1 minute
    val agg = in.toDF().toDF("ts", "k", "v")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "2 minutes"), col("k"))
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"))
    val q = agg.writeStream.format("memory").queryName("slate")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-slate").toString)
      .outputMode("append").start()
    def t(min: Int, sec: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")
    // b1: pusher at 10m -> watermark after b1 = 9m
    in.addData((t(10), "p", 0.0)); q.processAllAvailable()
    // b2, wm = 9m:
    //   row A at 8:30  (t < wm, t+gap = 10:30 > wm)  <- the boundary case
    //   row B at 6:30  (t+gap = 8:30 <= wm)          <- fully closed, must drop
    //   pusher at 20m to close everything
    in.addData((t(8, 30), "A", 1.0), (t(6, 30), "B", 1.0), (t(20), "p2", 0.0))
    q.processAllAvailable()
    // one more empty-advance
    in.addData((t(30), "p3", 0.0)); q.processAllAvailable()
    q.stop()
    println("== emitted ==")
    spark.table("slate").orderBy("k").show(20, truncate = false)
    spark.stop()
  }
}
