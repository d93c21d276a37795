package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase probe for the w2 streaming-ingest bench entries: replicates
  * Bench.StreamProbe's exact shape (MemoryStream → groupBy-sum →
  * noop sink, update mode, 8 state partitions, tmpfs checkpoint) and
  * prints the per-microbatch StreamingQueryProgress durationMs
  * breakdown (addBatch / getBatch / latestOffset / queryPlanning /
  * walCommit / commitOffsets / triggerExecution) plus state-store
  * custom metrics, so the engine-owned costs (state commit, offset/
  * commit WAL, incremental planning) are attributed before touching
  * anything. Usage: runMain graft.tools.W2Probe [rocksdb]
  */
object W2Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("w2-probe")
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("rocksdb")) graft.Engine.useRocksDBStateStore(spark)
    sys.env.get("W2_RETAIN").foreach(v =>
      spark.conf.set("spark.sql.streaming.minBatchesToRetain", v))
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val agg = in.toDF().toDF("user_id", "value")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.sum("value"))
    val shm = java.nio.file.Paths.get("/dev/shm")
    val ckpt = java.nio.file.Files.createTempDirectory(shm, "graft-w2probe").toString
    val q = agg.writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    var i = 0L
    def batch(n: Int, per: Int): Unit = (0 until n).foreach { _ =>
      in.addData((0 until per).map { j => i += 1; (i % 1000, j.toDouble) })
      q.processAllAvailable()
    }
    batch(2, 10000) // warmup
    val t0 = System.nanoTime()
    batch(30, 20000)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"STAGE w2probe: 30 batches in $sec%.2fs (${sec / 30 * 1000}%.0f ms/batch)")
    // durationMs across recent progresses (ms, summed per phase)
    val phases = scala.collection.mutable.LinkedHashMap[String, Long]()
    val ps = q.recentProgress.takeRight(30)
    ps.foreach { p =>
      p.durationMs.forEach { case (k, v) => phases(k) = phases.getOrElse(k, 0L) + v }
    }
    phases.foreach { case (k, v) =>
      println(f"STAGE w2probe: phase $k%-22s ${v.toDouble / ps.length}%8.1f ms/batch")
    }
    println(s"STAGE w2probe: progresses=${q.recentProgress.length} " +
      s"inputRows=${q.recentProgress.map(_.numInputRows).mkString(",")}")
    val sp = ps.last.stateOperators
    if (sp.nonEmpty) {
      println("STAGE w2probe: state custom metrics (last batch): " +
        sp.head.customMetrics.toString)
      println(f"STAGE w2probe: commitTimeMs last=${sp.head.commitTimeMs}")
    }
    q.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    Runtime.getRuntime.halt(0)
  }
}
