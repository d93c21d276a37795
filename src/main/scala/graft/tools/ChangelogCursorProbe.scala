package graft.tools

/** Per-trigger PLANNING cost of the changelog streaming source vs feed
  * age — the round-13 caveat made measurable: `latestOffset` used to
  * probe every `v=<id>/_SUCCESS` marker on EVERY microbatch
  * (O(|history|) RPCs forever on a long-lived feed), and
  * `planInputPartitions` listed the whole `changelog/` directory. The
  * listing cursor (committed version dirs are immutable, so only
  * unknown ids are re-probed) and the per-id range probe must make the
  * steady-state trigger cost FLAT in feed age:
  *
  *  - per |history| in {10², 10³, 10⁴}: a merge-table feed is crafted
  *    at that many committed versions (one real
  *    [[graft.streaming.Streams.mergeTableInsert]] version, then
  *    filesystem-level replication of its changelog batch dir + commit
  *    markers — planning never reads row contents, so the copies are
  *    the honest shape at 1/1000th the setup cost);
  *  - the FIRST `latestOffset` after (re)start legitimately probes the
  *    whole history once (reported separately);
  *  - then 50 steady-state paced triggers (`maxVersionsPerTrigger`-
  *    style 10-version windows walking the head) measure
  *    latestOffset + latestOffset(start, limit) + planInputPartitions
  *    per trigger — the numbers that must not grow with |history|.
  *
  * Local-FS `exists()` is microseconds where an object store pays a
  * full RPC, so the flat-vs-linear SHAPE is the result here; absolute
  * seconds understate the win at 10⁵ versions on S3.
  *
  * Usage: runMain graft.tools.ChangelogCursorProbe [maxHistory]
  */
object ChangelogCursorProbe {

  def main(args: Array[String]): Unit = {
    val maxHist = args.headOption.map(_.toInt).getOrElse(10000)
    val spark = graft.Engine.session("changelog-cursor-probe")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    import spark.implicits._

    val hists = Seq(100, 1000, maxHist).distinct.filter(_ > 0)
    hists.foreach { hist =>
      val tgt = java.nio.file.Files
        .createTempDirectory(s"graft-clprobe-$hist").toString
      // one REAL version fixes the marker, layout, and batch-dir shape
      graft.streaming.Streams.mergeTableInsert(spark, tgt,
        Seq((1L, "v")).toDF("k", "v"), createKeys = Seq("k"),
        changelog = true, retainVersions = Int.MaxValue)
      val src = new java.io.File(s"$tgt/changelog/batch=0")
      val parts = src.listFiles().filter(_.getName.endsWith(".parquet"))
      (1 until hist).foreach { id =>
        val dst = new java.io.File(s"$tgt/changelog/batch=$id")
        dst.mkdirs()
        parts.foreach(p => java.nio.file.Files.copy(p.toPath,
          new java.io.File(dst, p.getName).toPath))
        val v = new java.io.File(s"$tgt/v=$id")
        v.mkdirs()
        new java.io.File(v, "_SUCCESS").createNewFile()
      }
      val schema = spark.read.format("graft").option("changelog", true)
        .load(tgt).schema
      val ref = graft.sources.v2.GraftDataSource.TargetRef(
        tgt, None, Seq("k"), "merge", changelog = true,
        maxVersionsPerTrigger = 10L)
      val stream = new graft.sources.v2.GraftChangelogStream(ref, schema,
        spark.sessionState.newHadoopConf())
      import graft.sources.v2.GraftChangelogStream.VersionOffset
      def ms(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      // first call: the one legitimate whole-history probe
      val firstMs = ms(stream.latestOffset())
      // steady state: paced 10-version trigger windows at the head
      // (fewer at small histories — the window must stay non-empty)
      val windows = math.min(50, (hist - 1) / 10)
      val lo = math.max(0, hist - 1 - windows * 10)
      val times = (0 until windows).map { i =>
        val start = VersionOffset(lo + i * 10L)
        ms {
          stream.latestOffset()
          val end = stream
            .latestOffset(start,
              org.apache.spark.sql.connector.read.streaming.ReadLimit
                .allAvailable())
            .asInstanceOf[VersionOffset]
          val parts = stream.planInputPartitions(start, end)
          require(parts.nonEmpty, "probe planned an empty window")
        }
      }.sorted
      val med = times(times.length / 2)
      val p95 = times((times.length * 95) / 100)
      println(f"STAGE cursor: history=$hist%6d firstCallMs=$firstMs%8.1f " +
        f"steadyTriggerMedianMs=$med%6.2f p95Ms=$p95%6.2f")
      // RETENTION leg (truncateChangelog at half the history): the
      // truncation itself is ∝ |dropped dirs|, a steady-state trigger
      // above the floor is untouched, and the batch bootstrap read
      // (changelogOf at the floor — Spark lists the whole changelog/
      // dir before partition pruning) gets cheaper with the dirs gone
      val floor = hist / 2L
      val preBoot = ms { graft.streaming.Streams.changelogOf(spark, tgt,
        sinceVersion = floor).count() }
      val truncMs = ms { graft.streaming.Streams.truncateChangelog(
        spark, tgt, keepAfter = floor) }
      val postBoot = ms { graft.streaming.Streams.changelogOf(spark, tgt,
        sinceVersion = floor).count() }
      val postTrig = ms {
        val start = VersionOffset(hist - 11L)
        stream.latestOffset()
        val end = stream
          .latestOffset(start,
            org.apache.spark.sql.connector.read.streaming.ReadLimit
              .allAvailable())
          .asInstanceOf[VersionOffset]
        require(stream.planInputPartitions(start, end).nonEmpty,
          "post-truncation trigger planned empty")
      }
      println(f"STAGE retention: history=$hist%6d dropped=${floor + 1}%6d " +
        f"truncateMs=$truncMs%8.1f steadyTriggerAfterMs=$postTrig%6.2f " +
        f"bootstrapMs pre=$preBoot%8.1f post=$postBoot%8.1f")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tgt))
    }
    spark.stop()
    Runtime.getRuntime.halt(0)
  }
}
