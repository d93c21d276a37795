package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Merge-on-read table LIFECYCLE probe at 10^3 batches — the long-run
  * twin of StreamScaleProbe's 24-batch write-amplification A/B
  * (round-11 VERDICT #3): a seeded keyed table driven through ~1000
  * single-key-touch microbatches with the in-line geometric compaction
  * trigger and the changelog on, recording what must stay bounded for
  * the layout's 100 TB story to hold:
  *
  *  - generation count: O(log B) by the geometric trigger
  *    (tail >= max(compactEvery, covered));
  *  - raw batch-dir count: sawtooths under auto-vacuum, never grows
  *    with B;
  *  - per-trigger write bytes (rows + changelog layers): flat,
  *    ∝ |touched keys|;
  *  - per-trigger wall time: flat under the changelog KEY PUSHDOWN
  *    (the pre-image read prunes to the touched keys' row groups);
  *    the A/B leg re-runs with `changelogKeyPushdown = 0` (the
  *    unpruned semi-join) where per-trigger time grows with the
  *    compacted generation — the round-11 sharp edge #1 made visible;
  *  - `latestTableWhere` point-read latency at the end of the run
  *    (generation is key-range-clustered: flat however many batches
  *    the table has absorbed).
  *
  * Usage: runMain graft.tools.MergeLifecycleProbe [batches] [keys]
  *        [abBatches] [legs]
  * `legs` is a comma-separated subset of pushdown,semijoin,cappedtail
  * (default: all three) for single-leg iteration.
  */
object MergeLifecycleProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(1000)
    val tableKeys = args.lift(1).map(_.toInt).getOrElse(100000)
    val abBatches = args.lift(2).map(_.toInt).getOrElse(250)
    val touched = 20
    val spark = graft.Engine.session("merge-lifecycle-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    import spark.implicits._
    implicit val sql = spark.sqlContext

    def tmpd(p: String): String = {
      val d = java.nio.file.Files.createTempDirectory(p)
      d.toFile.deleteOnExit(); d.toString
    }
    def dirBytes(d: String): Long = {
      val f = new java.io.File(d)
      if (!f.exists) 0L
      else if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(x => dirBytes(x.getPath)).sum)
        .getOrElse(0L)
    }
    def gensOf(tgt: String): Int = {
      val p = new java.io.File(s"$tgt/compact/rows")
      Option(p.listFiles).map(_.count(f =>
        f.getName.startsWith("c=") &&
          new java.io.File(f, "_SUCCESS").exists)).getOrElse(0)
    }
    def rawDirs(tgt: String): Int = {
      val p = new java.io.File(s"$tgt/rows")
      Option(p.listFiles)
        .map(_.count(_.getName.startsWith("batch="))).getOrElse(0)
    }

    def run(pushdown: Int, nBatches: Int, label: String,
            maxTail: Int = 0): Unit = {
      val tgt = tmpd(s"mlp-$label-tgt")
      val ck = tmpd(s"mlp-$label-ck")
      val in = MemoryStream[(Long, Long, String, Boolean)]
      val q = graft.streaming.Streams.mergeSink(
        in.toDF().toDF("k", "seq", "payload", "del"), tgt, ck,
        Seq("k"), "seq", "del", compactEvery = 16,
        changelog = true, changelogKeyPushdown = pushdown,
        compactMaxTail = maxTail)
      try {
        // seed: one batch touching every key — the "table" the narrow
        // batches then mutate
        in.addData((0 until tableKeys).map(j => (j.toLong, 0L, s"p0-$j", false)))
        q.processAllAvailable()
        var i = 1
        var win = List.empty[Double] // rolling window of trigger secs
        while (i <= nBatches) {
          val rows = (0 until touched).map { j =>
            val k = ((j * 7919L + i * 104729L) % tableKeys).toInt
            (k.toLong, i.toLong, s"p$i-$k", j % 20 == 19)
          }
          val t0 = System.nanoTime()
          in.addData(rows)
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          win = (sec :: win).take(50)
          if (i <= 3 || i % 100 == 0 || i == nBatches) {
            val med = win.sorted.apply(win.length / 2)
            println(f"STAGE mlp_$label%-9s batch=$i%4d trig=$sec%6.2fs " +
              f"med50=$med%6.2fs gens=${gensOf(tgt)}%2d raw=${rawDirs(tgt)}%3d " +
              f"batchBytes=${dirBytes(s"$tgt/rows/batch=$i")}%7d " +
              f"clBytes=${dirBytes(s"$tgt/changelog/batch=$i")}%7d " +
              f"totalBytes=${dirBytes(tgt)}%11d")
          }
          i += 1
        }
      } finally q.stop()
      // served state sanity + point-read latency off the clustered
      // generation (auto-vacuum has already freed covered raw dirs)
      val live = graft.streaming.Streams.latestTable(spark, tgt)
        .map(_.count()).getOrElse(-1L)
      def pointRead(k: Long): Double = {
        val t0 = System.nanoTime()
        graft.streaming.Streams
          .latestTableWhere(spark, tgt, col("k") === k).get.count()
        (System.nanoTime() - t0) / 1e9
      }
      pointRead(1L) // warm plan
      val pr = (0 until 5).map(x => pointRead(12345L + x)).sorted.apply(2)
      println(f"STAGE mlp_$label%-9s FINAL live=$live%8d gens=${gensOf(tgt)}%2d " +
        f"raw=${rawDirs(tgt)}%3d pointRead=$pr%6.3fs " +
        f"totalBytes=${dirBytes(tgt)}%11d")
    }

    // leg selector (4th arg): run one leg for iterating; default all
    val legs = args.lift(3).map(_.split(",").toSet)
      .getOrElse(Set("pushdown", "semijoin", "cappedtail"))
    if (legs("pushdown")) run(1024, batches, "pushdown")
    // the A/B leg: same cadence, unpruned semi-join pre-image — its
    // per-trigger time grows with the generation; fewer batches are
    // enough to show the trend
    if (legs("semijoin")) run(0, abBatches, "semijoin")
    // the capped-tail leg: same cadence as pushdown, raw tail bounded
    // at 128 dirs — per-trigger time must stay flat where the pure
    // geometric schedule's creeps with its growing tail
    if (legs("cappedtail")) run(1024, batches, "cappedtail", maxTail = 128)
    Runtime.getRuntime.halt(0)
  }
}
