package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Per-round benchmark: runs every bench-flagged query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Methodology: each query is forced through the noop sink (full
  * materialization of every output row — `count()` would let Catalyst
  * prune the computation under test), 1 warmup + 3 timed runs, median.
  * A streaming entry (`w2_stream_ingest`) times a keyed streaming
  * aggregate over MemoryStream microbatches.
  */
object Bench {

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeIt(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  /** W2 keyed streaming aggregate throughput probe: seconds to push
    * `batches` microbatches of `perBatch` synthetic events through a
    * groupBy-count with the state store. */
  private def streamIngestSec(spark: SparkSession, batches: Int, perBatch: Int): Double = {
    // State-store partition count is fixed at first run from
    // spark.sql.shuffle.partitions; size it to the workload (20k rows /
    // 1k keys per batch) instead of the relational default — per-batch
    // overhead is proportional to state partitions, not data.
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try streamIngestRun(spark, batches, perBatch)
    finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  private def streamIngestRun(spark: SparkSession, batches: Int, perBatch: Int): Double = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val agg = in.toDF().toDF("user_id", "value")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.sum("value"))
    // tmpfs checkpoint: the probe measures state-store throughput, not
    // /tmp's ext4 fsync latency (a cluster would use fast local disks
    // or RocksDB with its own WAL batching for this)
    val shm = java.nio.file.Paths.get("/dev/shm")
    val ckpt = (if (java.nio.file.Files.isDirectory(shm))
      java.nio.file.Files.createTempDirectory(shm, "graft-bench-ckpt")
    else java.nio.file.Files.createTempDirectory("graft-bench-ckpt")).toString
    val q = agg.writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try timeIt {
      var i = 0L
      (0 until batches).foreach { _ =>
        in.addData((0 until perBatch).map { j => i += 1; (i % 1000, j.toDouble) })
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Engine.defaultCpus
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = Engine.session("graft-bench", cpus)

    // SPARK_GRAFT_BENCH_ONLY=name1,name2 restricts the set (local
    // iteration; may name bench=false queries too)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    Registry.all.filter(q => only.map(_.contains(q.name)).getOrElse(q.bench)).foreach { q =>
      try {
        val warm = timeIt(materialize(q.run(spark, sfDir))) // plan + JIT + page cache
        results(q.name) = median((0 until runs).map(_ => timeIt(materialize(q.run(spark, sfDir)))))
        System.err.println(f"[bench] ${q.name}%-22s warm=$warm%8.2fs med=${results(q.name)}%8.2fs")
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          results(q.name) = -1.0
      }
    }
    if (only.forall(_.contains("w2_stream_ingest"))) results("w2_stream_ingest") =
      try {
        streamIngestSec(spark, batches = 2, perBatch = 10000) // warmup
        median((0 until runs).map(_ => streamIngestSec(spark, batches = 10, perBatch = 20000)))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] w2_stream_ingest failed: ${e.getMessage}")
          -1.0
      }
    // same probe on the RocksDB state store (the 100TB keyed-state
    // backend): state off-heap in native RocksDB instead of the on-heap
    // HDFS-backed map
    if (only.forall(_.contains("w2_stream_ingest_rocksdb"))) results("w2_stream_ingest_rocksdb") =
      try {
        Engine.useRocksDBStateStore(spark)
        try {
          streamIngestSec(spark, batches = 2, perBatch = 10000) // warmup
          median((0 until runs).map(_ => streamIngestSec(spark, batches = 10, perBatch = 20000)))
        } finally Engine.useDefaultStateStore(spark)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] w2_stream_ingest_rocksdb failed: ${e.getMessage}")
          -1.0
      }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
