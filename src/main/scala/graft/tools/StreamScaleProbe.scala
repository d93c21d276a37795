package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming keyed-STATE scale probe under RocksDB — the batch
  * ScaleProbe covers throughput; this one covers STATE GROWTH, the
  * axis that actually kills long-running streaming jobs at 100 TB.
  * Two long-lived queries (one per probe — the Bench.StreamProbe
  * shape), each pushed `batches` microbatches at 10–20× the spec
  * fixtures' key cardinality, recording per-batch wall time plus the
  * state store's own counters (`numRowsTotal`, memory/size bytes)
  * from StreamingQueryProgress. A cliff shows up as superlinear
  * per-batch time or state rows growing with STREAM LIFETIME instead
  * of the active horizon:
  *
  *  - `stream_session_join`: [[graft.streaming.Streams.sessionWindowJoin]]
  *    over 20k concurrent keys (spec fixtures: 2–3). Event time
  *    advances every batch, so closed sessions must leave state via
  *    their event-time timers — bounded by OPEN sessions (≈ keys).
  *  - `stream_neardup`: [[graft.streaming.Streams.nearDupCandidates]]
  *    with event-time bucket TTL over ~5k docs/batch (spec fixtures:
  *    a few hundred total). Per-bucket FIFO caps pair fan-out; the
  *    TTL must expire cold buckets so bucket cardinality tracks the
  *    horizon, not every bucket ever seen.
  *
  * Usage: runMain graft.tools.StreamScaleProbe [batches] [keys]
  */
object StreamScaleProbe {
  private def progressLine(name: String, batch: Int, sec: Double,
                           q: StreamingQuery): Unit = {
    val so = Option(q.lastProgress).map(_.stateOperators).getOrElse(Array.empty)
    val rows = so.map(_.numRowsTotal).sum
    val mem = so.map(_.memoryUsedBytes).sum
    println(f"STAGE $name%-24s batch=$batch%2d ${sec}%7.2fs stateRows=$rows%8d stateBytes=$mem%12d")
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(10)
    val keys = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = graft.Engine.session("stream-scale-probe")
    graft.Engine.useRocksDBStateStore(spark)
    // state partitions sized to the workload, as Bench.StreamProbe does
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    // A note on the reported stateBytes, established by A/B here: under
    // Engine.useRocksDBStateStore's boundedMemoryUsage, the memory
    // metric reports the SHARED 1 GiB LRU cache's fill level, which
    // grows deterministically toward its cap while live rows stay flat
    // (the second probe's batch-0 bytes continue exactly where the
    // first probe's final batch left off — one cache, two queries).
    // Measured: ~4.2 MB/batch growth at CONSTANT numRowsTotal,
    // byte-identical across compactOnCommit=true ("compact" arg),
    // minBatchesToRetain=3 ("retain3"), and a 2s maintenance interval
    // ("maint2s") — so the curve is cache fill bounded at
    // maxMemoryUsageMB by construction (the per-executor budget
    // posture a production cluster wants), not version garbage and not
    // a state leak. numRowsTotal is the live-state contract.
    if (args.lift(2).contains("compact"))
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb.compactOnCommit", "true")
    if (args.lift(2).contains("retain3"))
      spark.conf.set("spark.sql.streaming.minBatchesToRetain", "3")
    if (args.lift(2).contains("maint2s"))
      spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "2s")
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val shm = java.nio.file.Paths.get("/dev/shm")
    def ckpt(tag: String) = (if (java.nio.file.Files.isDirectory(shm))
      java.nio.file.Files.createTempDirectory(shm, s"graft-ssp-$tag")
    else java.nio.file.Files.createTempDirectory(s"graft-ssp-$tag")).toString

    // ---- session-window stream-stream join, 20k concurrent keys ------
    // Per batch: one left + one right row per key inside a 10s-gap
    // session; event time advances 60s per batch, so batch i's sessions
    // are ALL closed (and their state freed) by the time batch i+2's
    // watermark lands. Bounded state = rows for <= ~2 batches of open
    // sessions, independent of `batches`.
    locally {
      val left = MemoryStream[(Long, java.sql.Timestamp, String)]
      val right = MemoryStream[(Long, java.sql.Timestamp, String)]
      val joined = graft.streaming.Streams.sessionWindowJoin(
        left.toDF().toDF("k", "ts", "v"), right.toDF().toDF("k", "ts", "v"),
        "k", "ts", "v", watermark = "30 seconds", gapMs = 10000L)
      val q = joined.writeStream.format("noop")
        .option("checkpointLocation", ckpt("sess"))
        .outputMode(OutputMode.Append()).start()
      try {
        var i = 0
        while (i < batches) {
          val base = 1700000000000L + i * 60000L
          val t0 = System.nanoTime()
          left.addData((0 until keys).map(k =>
            (k.toLong, new java.sql.Timestamp(base + (k % 7) * 1000L), s"l$i")))
          right.addData((0 until keys).map(k =>
            (k.toLong, new java.sql.Timestamp(base + 2000L + (k % 5) * 1000L), s"r$i")))
          q.processAllAvailable()
          progressLine("stream_session_join_20k", i, (System.nanoTime() - t0) / 1e9, q)
          i += 1
        }
      } finally q.stop()
    }

    // ---- session-window TWS aggregate (round 6), 20k concurrent keys --
    // One row per key per batch inside a 10s-gap session; event time
    // advances 60s per batch, so batch i's sessions close (and leave
    // state via their timers) once batch i+1's watermark lands. Bounded
    // state = open sessions only; per-batch time flat.
    locally {
      val rows = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val agg = graft.streaming.Streams.sessionAggTws[Long](
        rows.toDS(), watermark = "30 seconds", gapMs = 10000L)
      val q = agg.toDF("k", "start", "end", "cnt", "sum_v")
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt("sessagg"))
        .outputMode(OutputMode.Append()).start()
      try {
        var i = 0
        while (i < math.max(batches, 5)) {
          val base = 1700000000000L + i * 60000L
          val t0 = System.nanoTime()
          rows.addData((0 until keys).map(k =>
            (k.toLong, new java.sql.Timestamp(base + (k % 7) * 1000L), 1.0)))
          q.processAllAvailable()
          progressLine("stream_session_agg_20k", i, (System.nanoTime() - t0) / 1e9, q)
          i += 1
        }
      } finally q.stop()
    }

    // ---- streaming near-dup candidates with bucket TTL ---------------
    // ~5k docs per batch; every 10th doc reuses an earlier text, so
    // real candidates flow every batch. Texts are word sequences (the
    // 3-shingle pipeline needs >= 3 tokens); event time advances 10
    // minutes per batch against a 25-minute bucket TTL, so buckets
    // older than ~3 batches must leave state via their timers.
    locally {
      val perBatch = 5000
      val docs = MemoryStream[(Long, String, java.sql.Timestamp)]
      val cands = graft.streaming.Streams.nearDupCandidates(
        docs.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text",
        maxPerBucket = 16, tsCol = Some("ts"), watermark = "5 minutes",
        bucketTtlMs = 25 * 60 * 1000L)
      val q = cands.writeStream.format("noop")
        .option("checkpointLocation", ckpt("ndup"))
        .outputMode(OutputMode.Append()).start()
      try {
        var i = 0
        while (i < batches) {
          val base = 1700000000000L + i * 600000L
          val t0 = System.nanoTime()
          docs.addData((0 until perBatch).map { j =>
            val gid = i.toLong * perBatch + j
            // every 10th doc duplicates the text family of doc j-1
            val seed = if (j % 10 == 0 && j > 0) gid - 1 else gid
            val words = (0 until 12).map(w => s"w${(seed * 31 + w * 7) % 997}")
            (gid, words.mkString(" "), new java.sql.Timestamp(base + (j % 60) * 1000L))
          })
          q.processAllAvailable()
          progressLine("stream_neardup_5k", i, (System.nanoTime() - t0) / 1e9, q)
          i += 1
        }
      } finally q.stop()
    }

    // ---- streaming IVM: aggSnapshotSink under a 100k-group snapshot --
    // The per-batch cost model is O(|touched keys|): each trigger
    // appends ONE signed partial per touched key under delta/batch=<id>
    // and never reads or rewrites the accumulated snapshot — so the
    // bytes written per batch must track the batch's own key count, not
    // the group cardinality. Batches ALTERNATE between wide deltas
    // (50k rows touching ~50k groups) and narrow ones (5k rows / ~5k
    // groups) so the log shows batchBytes vs |touched| directly: the
    // narrow batches must write ~10x less than the wide ones, forever.
    // The in-line geometric compaction (compactEvery=8) folds layers
    // into |live groups|-sized generations so the read side
    // (latestSnapshot's per-key fold) stays bounded too; deltaDirs
    // reports how many uncompacted layers a read currently folds.
    val ivmBatches = args.lift(3).map(_.toInt).getOrElse(100)
    def dirBytes(fsPath: String): Long = {
      val p = new org.apache.hadoop.fs.Path(fsPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
    }
    def deltaDirs(tgt: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$tgt/delta")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(_.getPath.getName.startsWith("batch="))
    }
    locally {
      val groups = 100000
      val tgt = ckpt("ivm-tgt")
      val changes = MemoryStream[(Long, Double, Int)]
      val q = graft.streaming.Streams.aggSnapshotSink(
        changes.toDF().toDF("k", "v", "op"), tgt, ckpt("ivm-ck"),
        Seq("k"), "op", Seq("v"), compactEvery = 8)
      try {
        var i = 0
        while (i < ivmBatches) {
          val perBatch = if (i % 2 == 0) 50000 else 5000
          val t0 = System.nanoTime()
          changes.addData((0 until perBatch).map { j =>
            val k = (j * 2 + (i % 2)) % groups
            val op = if (j % 5 == 4 && i > 1) -1 else 1 // 20% retractions
            (k.toLong, (k % 100) / 4.0, op)
          })
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          if (i < 6 || i % 10 == 0 || i == ivmBatches - 1) {
            val nGroups = graft.streaming.Streams.latestSnapshot(spark, tgt)
              .map(_.count()).getOrElse(0L)
            val batchBytes = dirBytes(s"$tgt/delta/batch=$i")
            println(f"STAGE stream_ivm_100k       batch=$i%3d $sec%7.2fs touched=$perBatch%6d snapGroups=$nGroups%8d deltaDirs=${deltaDirs(tgt)}%3d batchBytes=$batchBytes%9d dirBytes=${dirBytes(tgt)}%10d")
          }
          i += 1
        }
      } finally q.stop()
    }

    // ---- merge-on-read keyed table vs full-rewrite upsert (round 11) -
    // The write-amplification A/B the mergeSink layout exists for: both
    // sinks consume the same CDC cadence over a ~200k-row keyed table —
    // a seeding batch touching every key, then alternating wide (50k)
    // and narrow (5k) updates with 5% deletes. mergeSink's batchBytes
    // must track |touched| (narrow batches ~10x smaller, forever),
    // while upsertSink's per-version bytes stay ~|whole table| however
    // small the batch — the exact shape that kills a keyed fact at
    // 100 TB. liveRows (latestTable count) pins that the cheap writes
    // still serve the right state.
    locally {
      val tableKeys = 200000
      val tgt = ckpt("mor-tgt")
      def rowsDirs(t: String): Int = {
        val p = new org.apache.hadoop.fs.Path(s"$t/rows")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) 0
        else fs.listStatus(p).count(_.getPath.getName.startsWith("batch="))
      }
      val changes = MemoryStream[(Long, Long, String, Boolean)]
      // changelog on: per-trigger cost now includes the retraction
      // derivation (key-semi-joined layers -> window over touched keys
      // only), so flat narrow-batch latency here is the proof the
      // derivation is O(|touched|), not O(|table|)
      val q = graft.streaming.Streams.mergeSink(
        changes.toDF().toDF("k", "seq", "payload", "del"), tgt, ckpt("mor-ck"),
        Seq("k"), "seq", "del", compactEvery = 8, changelog = true)
      def batchRows(i: Int, touched: Int): Seq[(Long, Long, String, Boolean)] =
        (0 until touched).map { j =>
          val k = if (i == 0) j else (j * 3 + i) % tableKeys
          (k.toLong, i.toLong, s"p$i-$k", i > 0 && j % 20 == 19)
        }
      try {
        var i = 0
        val morBatches = math.max(10, ivmBatches / 5)
        while (i < morBatches) {
          val touched = if (i == 0) tableKeys else if (i % 2 == 1) 50000 else 5000
          val t0 = System.nanoTime()
          changes.addData(batchRows(i, touched))
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          if (i < 6 || i % 10 == 0 || i == morBatches - 1) {
            val live = graft.streaming.Streams.latestTable(spark, tgt)
              .map(_.count()).getOrElse(0L)
            val batchBytes = dirBytes(s"$tgt/rows/batch=$i")
            val clBytes = dirBytes(s"$tgt/changelog/batch=$i")
            println(f"STAGE merge_table_200k      batch=$i%3d $sec%7.2fs touched=$touched%6d liveRows=$live%8d rowsDirs=${rowsDirs(tgt)}%3d batchBytes=$batchBytes%9d clBytes=$clBytes%9d dirBytes=${dirBytes(tgt)}%10d")
          }
          i += 1
        }
      } finally q.stop()
      // A/B: the same first batches through upsertSink — per-version
      // bytes == the whole table even for a 5k-row change batch
      val upTgt = ckpt("mor-up")
      val upChanges = MemoryStream[(Long, Long, String, Boolean)]
      val uq = graft.streaming.Streams.upsertSink(
        upChanges.toDF().toDF("k", "seq", "payload", "del"), upTgt,
        ckpt("mor-upck"), Seq("k"), "seq", "del")
      try {
        var i = 0
        while (i < 5) {
          val touched = if (i == 0) tableKeys else if (i % 2 == 1) 50000 else 5000
          val t0 = System.nanoTime()
          upChanges.addData(batchRows(i, touched))
          uq.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"STAGE merge_table_upsertAB  batch=$i%3d $sec%7.2fs touched=$touched%6d versionBytes=${dirBytes(s"$upTgt/v=$i")}%10d")
          i += 1
        }
      } finally uq.stop()
    }

    // ---- streaming IVM with KMV distinct sketches (round 6) ----------
    // aggSnapshotSinkAppendOnly maintaining per-group kmv_<c> sketch
    // columns: each batch's partial adds a k-bounded sketch array per
    // touched key on top of the count/sum/min/max columns — per-batch
    // time and batchBytes must stay flat (∝ touched keys), and the
    // compacted generation stays |groups|-sized (sketches are
    // k-bounded, so the distinct-value count of the stream never shows
    // up in state).
    locally {
      val groups = 100000
      val perBatch = 50000
      val tgt = ckpt("ivmk-tgt")
      val rows = MemoryStream[(Long, Double, String)]
      val q = graft.streaming.Streams.aggSnapshotSinkAppendOnly(
        rows.toDF().toDF("k", "v", "u"), tgt, ckpt("ivmk-ck"),
        Seq("k"), Seq("v"), distinctCols = Seq("u"), compactEvery = 8)
      try {
        var i = 0
        val kmvBatches = math.max(10, ivmBatches / 5)
        while (i < kmvBatches) {
          val t0 = System.nanoTime()
          rows.addData((0 until perBatch).map { j =>
            val k = (j * 2 + (i % 2)) % groups
            // unbounded distinct-value stream per group
            (k.toLong, (k % 100) / 4.0, s"u${i.toLong * perBatch + j}")
          })
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          if (i < 6 || i % 5 == 0 || i == kmvBatches - 1) {
            val batchBytes = dirBytes(s"$tgt/delta/batch=$i")
            println(f"STAGE stream_ivm_kmv        batch=$i%3d $sec%7.2fs touched=$perBatch%6d deltaDirs=${deltaDirs(tgt)}%3d batchBytes=$batchBytes%9d dirBytes=${dirBytes(tgt)}%10d")
          }
          i += 1
        }
      } finally q.stop()
    }

    // Maintained-index COMPACTION lifecycle at many-microbatch scale:
    // the batch-dir sinks are write-optimal (each batch appends only
    // its own rows) but a search must consult every batch's files
    // until compactIndex collapses them into one whole-corpus
    // term-clustered generation. Measured here: the same 4-term BM25
    // search before compaction (per-batch clustering only), after
    // compaction, and after vacuum — plus the file counts that drive
    // the difference. At production microbatch cadence this is
    // thousands of dirs per day, not forty.
    {
      graft.Engine.useDefaultStateStore(spark)
      val nBatches = args.lift(4).map(_.toInt).getOrElse(40)
      val docsPer = 2500
      val base = ckpt("compact-base")
      val tgt = ckpt("compact-tgt")
      val ck = ckpt("compact-ck")
      (0 until nBatches).foreach { b =>
        (0 until docsPer).map { j =>
          val id = b.toLong * docsPer + j
          (id, s"join hash w${id % 997} shuffle p${id % 89} " +
            Seq.fill((j % 7) + 1)(s"f${(id * 31) % 4001}").mkString(" "))
        }.toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(base)
      }
      val q = graft.streaming.Streams.bm25IndexSink(
        spark.readStream.schema("doc_id long, text string")
          .option("maxFilesPerTrigger", 1).parquet(base),
        tgt, ck, "doc_id", "text")
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val ingestS = (System.nanoTime() - t0) / 1e9
      val queries = Seq((1, "join"), (1, "w13"), (2, "shuffle"), (2, "p7"))
        .toDF("query_id", "term")
      def parquetsUnder(dir: String): Int = {
        val d = new java.io.File(dir)
        if (!d.isDirectory) 0
        else d.listFiles.map(f => if (f.isDirectory) parquetsUnder(f.toString)
          else if (f.getName.endsWith(".parquet")) 1 else 0).sum
      }
      def timeSearch(): Double = {
        val runs = (0 until 3).map { _ =>
          val t = System.nanoTime()
          graft.streaming.Streams
            .bm25SearchMaintained(spark, tgt, queries, 10).count()
          (System.nanoTime() - t) / 1e9
        }
        runs.sorted.apply(1)
      }
      val preS = timeSearch()
      val preFiles = parquetsUnder(s"$tgt/postings")
      println(f"STAGE compact_pre           batches=$nBatches%3d ingest=$ingestS%7.2fs search=$preS%6.2fs postingsFiles=$preFiles%5d")
      val t1 = System.nanoTime()
      val cv = graft.streaming.Streams.compactIndex(spark, tgt, "postings",
        Seq("term"), targetFiles = 8)
      val compactS = (System.nanoTime() - t1) / 1e9
      val midS = timeSearch()
      val genFiles = parquetsUnder(s"$tgt/compact")
      println(f"STAGE compact_run           upto=${cv.getOrElse(-1L)}%3d $compactS%7.2fs search=$midS%6.2fs genFiles=$genFiles%5d")
      val freed = graft.streaming.Streams.vacuumIndex(spark, tgt, "postings")
      val postS = timeSearch()
      println(f"STAGE compact_post          vacuumed=${freed.length}%3d dirs search=$postS%6.2fs postingsFiles=${parquetsUnder(s"$tgt/postings")}%5d")
    }

    // Geometric auto-compaction at MANY-batch scale (round 11): the
    // skipping-index sink self-maintains with compactEvery=1 across
    // ~10³ microbatches — the regime where a production stream lives
    // within a day. What must hold: generations ever written is
    // O(log B) (the doubling schedule: 0,1,3,7,…), retention keeps
    // only the last 2 on disk, vacuum holds the batch-dir count to the
    // post-generation tail, and an auto-pruned SkipRewrite point
    // lookup opens O(targetFiles) files with FLAT latency however many
    // batches have flowed — the read side must not decay with stream
    // lifetime. The final out-of-band compact+vacuum folds the tail
    // and the lookup gets cheaper still.
    {
      val gBatches = args.lift(5).map(_.toInt).getOrElse(1000)
      val base = ckpt("geo-base")
      val tgt = ckpt("geo-tgt")
      val ck = ckpt("geo-ck")
      // one tiny file per microbatch, landed up front; the sink drains
      // them one per trigger
      val t0 = System.nanoTime()
      (0 until gBatches).foreach { b =>
        Seq((b.toLong * 7919L, s"p$b")).toDF("uid", "payload")
          .coalesce(1).write.mode("append").parquet(base)
      }
      val landS = (System.nanoTime() - t0) / 1e9
      val q = graft.streaming.Streams.skippingIndexSink(
        spark.readStream.schema("uid long, payload string")
          .option("maxFilesPerTrigger", 1).parquet(base),
        tgt, ck, Seq("uid"), fpCols = Seq("uid"),
        // this leg measures the PURE geometric schedule — opt out of
        // the round-13 derived cap (compactMaxTail defaults to
        // 8 × compactEvery; Bm25LifecycleProbe measures capped-vs-not)
        compactEvery = 1, compactFiles = 4, compactMaxTail = 0)
      val t1 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      val ingestS = (System.nanoTime() - t1) / 1e9
      val (gens, dirs) = graft.streaming.Streams.compactionsOf(spark, tgt, "stats")
      graft.plans.SkipRewrite.registerVersioned(spark, base, tgt)
      def lookup(i: Int) = spark.read.parquet(base)
        .filter(col("uid") === i.toLong * 7919L)
      def openedFiles(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.inputFiles.length
              case _ => 0
            }
        }.sum
      def probe(label: String): Unit = {
        val times = Seq(1, gBatches / 2, gBatches - 1).map { i =>
          val t = System.nanoTime()
          val n = lookup(i).count()
          require(n == 1, s"geometric probe lost uid $i")
          (System.nanoTime() - t) / 1e9
        }
        val opened = Seq(1, gBatches / 2, gBatches - 1).map(i => openedFiles(lookup(i)))
        println(f"STAGE geometric_lookup      $label%-10s opened=${opened.mkString("/")}%-12s sec=${times.map(t => f"$t%.2f").mkString("/")}")
      }
      println(f"STAGE geometric_ingest      batches=$gBatches%5d land=$landS%7.2fs ingest=$ingestS%8.2fs gensRetained=${gens.mkString(",")} tailDirs=${dirs.length}%4d")
      probe("auto")
      // fold the post-generation tail and free it — the scheduled
      // maintenance pass
      graft.streaming.Streams.compactIndex(spark, tgt, "stats", Seq("file"),
        targetFiles = 4, minBatches = 1)
      graft.streaming.Streams.vacuumIndex(spark, tgt, "stats")
      val (gens2, dirs2) = graft.streaming.Streams.compactionsOf(spark, tgt, "stats")
      println(f"STAGE geometric_folded      gensRetained=${gens2.mkString(",")} tailDirs=${dirs2.length}%4d")
      probe("folded")
      graft.plans.SkipRewrite.unregister(base)
    }

    // Halt, not stop: same RocksDB native-teardown guard as Bench.
    Console.out.flush()
    Runtime.getRuntime.halt(0)
  }
}
