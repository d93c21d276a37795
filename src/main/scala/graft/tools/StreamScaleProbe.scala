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
    // The per-batch cost model is O(|delta| + |snapshot|) — the
    // versioned write rewrites the (bounded, group-cardinality-sized)
    // snapshot, NEVER the base table — so per-batch time must stay
    // FLAT across 100+ batches once all groups exist. Batches
    // ALTERNATE between wide deltas (50k rows touching ~50k groups)
    // and narrow ones (5k rows / ~5k groups) so the log shows time vs
    // |touched groups| directly; version-directory count and on-disk
    // bytes are reported per sampled batch — retention must hold the
    // chain at retainVersions (3) forever, not let the target grow one
    // full snapshot per microbatch.
    val ivmBatches = args.lift(3).map(_.toInt).getOrElse(100)
    def dirStats(fsPath: String): (Int, Long) = {
      val p = new org.apache.hadoop.fs.Path(fsPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) (0, 0L)
      else {
        val vs = fs.listStatus(p).filter(_.getPath.getName.startsWith("v="))
        (vs.length, vs.map(st => fs.getContentSummary(st.getPath).getLength).sum)
      }
    }
    locally {
      val groups = 100000
      val tgt = ckpt("ivm-tgt")
      val changes = MemoryStream[(Long, Double, Int)]
      val q = graft.streaming.Streams.aggSnapshotSink(
        changes.toDF().toDF("k", "v", "op"), tgt, ckpt("ivm-ck"),
        Seq("k"), "op", Seq("v"))
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
            val (nVers, bytes) = dirStats(tgt)
            println(f"STAGE stream_ivm_100k       batch=$i%3d $sec%7.2fs touched=$perBatch%6d snapGroups=$nGroups%8d versions=$nVers%2d dirBytes=$bytes%10d")
          }
          i += 1
        }
      } finally q.stop()
    }

    // ---- streaming IVM with KMV distinct sketches (round 6) ----------
    // aggSnapshotSinkAppendOnly maintaining per-group kmv_<c> sketch
    // columns: the refresh adds a per-row bounded array merge (k=64
    // longs) on top of the count/sum/min/max arithmetic — per-batch
    // time must stay flat and within ~2x of the plain sink's, and the
    // snapshot stays |groups|-sized (sketches are k-bounded, so the
    // distinct-value count of the stream never shows up in state).
    locally {
      val groups = 100000
      val perBatch = 50000
      val tgt = ckpt("ivmk-tgt")
      val rows = MemoryStream[(Long, Double, String)]
      val q = graft.streaming.Streams.aggSnapshotSinkAppendOnly(
        rows.toDF().toDF("k", "v", "u"), tgt, ckpt("ivmk-ck"),
        Seq("k"), Seq("v"), distinctCols = Seq("u"))
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
            val (nVers, bytes) = dirStats(tgt)
            println(f"STAGE stream_ivm_kmv        batch=$i%3d $sec%7.2fs touched=$perBatch%6d versions=$nVers%2d dirBytes=$bytes%10d")
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

    // Halt, not stop: same RocksDB native-teardown guard as Bench.
    Console.out.flush()
    Runtime.getRuntime.halt(0)
  }
}
