package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** SURVEY §2.1 S5 — the DataSource V2 split-based source, batch and
  * microbatch sides. */
class DataSourceV2Spec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def read(rows: Long, parts: Int) =
    spark.read.format("synthetic-events")
      .option("rows", rows).option("numPartitions", parts)
      .option("seed", 42).load()

  test("batch read: row count, split planning, schema") {
    val df = read(1000, 7)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.columns.toSeq == Seq("event_id", "ts", "user_id", "event_type", "value"))
  }

  test("deterministic across reads and partitionings (split-independent)") {
    val a = read(500, 3).orderBy("event_id").collect().toSeq
    val b = read(500, 9).orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("predicate + projection compose over the source") {
    val n = read(1000, 4).filter(col("event_type") === "click").select("event_id").count()
    assert(n > 0 && n < 1000)
  }

  test("microbatch stream delivers all rows across triggers") {
    val stream = spark.readStream.format("synthetic-events")
      .option("rows", 250).option("rowsPerBatch", 100)
      .option("numPartitions", 4).load()
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("synth_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      // admission control paces 100+100+50; processAllAvailable drains all
      q.processAllAvailable()
      val total = spark.table("synth_stream").collect().head.getLong(0)
      assert(total == 250, s"got $total")
      assert(q.recentProgress.length >= 3, "expected >= 3 microbatches")
    } finally q.stop()
  }

  test("format(\"graft\"): merge tables and snapshots read with the API " +
      "path's exact resolution; asOf time-travels; SQL opens them") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    def tmp(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(col): _*).orderBy(cols.map(col): _*)
        .collect().map(_.toString).toSeq
    }
    // merge-on-read table: three batches with updates and a tombstone
    val morTgt = tmp("graft-dsv2-mor")
    val morIn = MemoryStream[(Long, String, Long, Boolean)]
    val mq = graft.streaming.Streams.mergeSink(
      morIn.toDF().toDF("k", "v", "seq", "del"), morTgt,
      tmp("graft-dsv2-morck"), Seq("k"), "seq", "del")
    try {
      morIn.addData((1L, "a1", 1L, false), (2L, "b1", 1L, false))
      mq.processAllAvailable()
      morIn.addData((1L, "a2", 2L, false), (3L, "c1", 1L, false))
      mq.processAllAvailable()
      morIn.addData((2L, "gone", 3L, true))
      mq.processAllAvailable()
    } finally mq.stop()
    val viaApi = canon(graft.streaming.Streams.latestTable(spark, morTgt).get)
    val viaFormat = canon(spark.read.format("graft").load(morTgt))
    assert(viaFormat == viaApi,
      s"format read diverged from the API path:\n$viaFormat\nvs\n$viaApi")
    // asOf: version 1 == the API's time travel
    assert(canon(spark.read.format("graft").option("asOf", 1L).load(morTgt)) ==
      canon(graft.streaming.Streams.latestTable(spark, morTgt,
        asOf = Some(1L)).get), "asOf diverged from the API time travel")
    // key filter (commutes -> pushed) and non-key filter (post-scan)
    // both answer exactly
    assert(spark.read.format("graft").load(morTgt)
      .filter(col("k") === 1L).collect().map(_.getString(1)).toSeq ==
      Seq("a2"))
    assert(spark.read.format("graft").load(morTgt)
      .filter(col("v") === "a2").count() == 1)
    // a merge sink without changelog=true has no feed: loud refusal
    val exNoCl = intercept[Exception](spark.read.format("graft")
      .option("changelog", true).load(morTgt).collect())
    assert(exNoCl.getMessage.contains("changelog"))
    // SQL: the same target as a catalog table
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW mor_sql " +
      s"USING graft OPTIONS (path '$morTgt')")
    assert(canon(spark.sql("SELECT * FROM mor_sql")) == viaApi,
      "SQL read diverged from the API path")
    assert(spark.sql("SELECT count(*) AS n FROM mor_sql").head.getLong(0) ==
      viaApi.size)

    // agg snapshot: fold served identically
    val snapTgt = tmp("graft-dsv2-snap")
    val snapIn = MemoryStream[(String, Double)]
    val sq = graft.streaming.Streams.aggSnapshotSinkAppendOnly(
      snapIn.toDF().toDF("k", "v"), snapTgt, tmp("graft-dsv2-snapck"),
      Seq("k"), Seq("v"))
    try {
      snapIn.addData(("a", 1.0), ("b", 2.0)); sq.processAllAvailable()
      snapIn.addData(("a", 3.0), ("c", 4.0)); sq.processAllAvailable()
    } finally sq.stop()
    val snapApi = canon(graft.streaming.Streams.latestSnapshot(spark, snapTgt).get)
    assert(canon(spark.read.format("graft").load(snapTgt)) == snapApi,
      "snapshot format read diverged from the API fold")
    assert(canon(spark.read.format("graft").option("asOf", 0L).load(snapTgt)) ==
      canon(graft.streaming.Streams.snapshotAsOf(spark, snapTgt, 0L)),
      "snapshot asOf diverged")
    // projection pruning composes (COUNT(*) included)
    assert(spark.read.format("graft").load(snapTgt).select("k")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"))
    assert(spark.read.format("graft").load(snapTgt).count() == 3)
    // a KEY filter on the snapshot routes through the PRE-FOLD pushdown
    // (latestSnapshotWhere) and still folds exactly — key "a" has
    // partials in BOTH batches
    assert(canon(spark.read.format("graft").load(snapTgt)
      .filter(col("k") === "a")) ==
      canon(graft.streaming.Streams.latestSnapshot(spark, snapTgt).get
        .filter(col("k") === "a")),
      "key-filtered snapshot read diverged from the filtered fold")
    // the change FEED through the format face: changelog=true over a
    // feed-emitting merge sink equals changelogOf row-for-row, and
    // sinceVersion cuts the prefix; the option refuses on a snapshot
    val clTgt = tmp("graft-dsv2-cl")
    val clIn = MemoryStream[(Long, String, Long, Boolean)]
    val cq = graft.streaming.Streams.mergeSink(
      clIn.toDF().toDF("k", "v", "seq", "del"), clTgt,
      tmp("graft-dsv2-clck"), Seq("k"), "seq", "del", changelog = true)
    try {
      clIn.addData((1L, "a1", 1L, false)); cq.processAllAvailable()
      clIn.addData((1L, "a2", 2L, false), (2L, "b1", 1L, false))
      cq.processAllAvailable()
    } finally cq.stop()
    assert(canon(spark.read.format("graft").option("changelog", true)
      .load(clTgt)) ==
      canon(graft.streaming.Streams.changelogOf(spark, clTgt)),
      "format changelog diverged from changelogOf")
    assert(canon(spark.read.format("graft").option("changelog", true)
      .option("sinceVersion", 0L).load(clTgt)) ==
      canon(graft.streaming.Streams.changelogOf(spark, clTgt,
        sinceVersion = 0L)), "sinceVersion diverged")
    val exSnapCl = intercept[Exception](spark.read.format("graft")
      .option("changelog", true).load(snapTgt).collect())
    assert(exSnapCl.getMessage.contains("merge tables only"))
    // a plain parquet dir refuses loudly
    val plain = tmp("graft-dsv2-plain")
    Seq((1L, "x")).toDF("a", "b").write.parquet(s"$plain/p")
    val ex = intercept[Exception](
      spark.read.format("graft").load(s"$plain/p").collect())
    assert(ex.getMessage.contains("no _merge or _layout marker"))
  }

  test("readStream.format(\"graft\") changelog: an external streaming " +
      "aggregation over the feed equals the rebuilt table across a " +
      "mid-feed restart; snapshots and non-feed tables refuse") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    def tmp(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString
    val tgt = tmp("graft-dsv2-stream")
    val in = MemoryStream[(Long, Double, Long, Boolean)]
    val q = graft.streaming.Streams.mergeSink(
      in.toDF().toDF("k", "x", "seq", "del"), tgt,
      tmp("graft-dsv2-streamck"), Seq("k"), "seq", "del", changelog = true)
    val consumerCk = tmp("graft-dsv2-consck")
    def startConsumer() = spark.readStream.format("graft")
      .option("changelog", true).load(tgt)
      .groupBy("k")
      .agg(sum(col("op") * col("x")).as("sx"),
        sum(col("op")).as("n"))
      .writeStream.format("memory").queryName("graft_feed_agg")
      .option("checkpointLocation", consumerCk)
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData((1L, 10.0, 1L, false), (2L, 20.0, 1L, false))
      q.processAllAvailable()
      in.addData((1L, 11.0, 2L, false), (3L, 30.0, 1L, false))
      q.processAllAvailable()
      // consume the first two versions, then STOP the consumer mid-feed
      val c1 = startConsumer()
      try c1.processAllAvailable() finally c1.stop()
      val partial = spark.table("graft_feed_agg").collect()
      assert(partial.nonEmpty, "consumer saw nothing before the restart")
      // more mutations land while the consumer is down: an update, a
      // delete, and a fresh key
      in.addData((2L, 21.0, 2L, false), (3L, 0.0, 2L, true),
        (4L, 40.0, 1L, false))
      q.processAllAvailable()
      // restart from the SAME checkpoint: Spark's offset log replays
      // nothing already committed and serves exactly the new versions
      val c2 = startConsumer()
      try c2.processAllAvailable() finally c2.stop()
      // the telescoped feed aggregate == the rebuilt table: live keys
      // carry (sx = latest x, n = 1), deleted keys telescope to n = 0
      val viaFeed = spark.table("graft_feed_agg")
        .filter(col("n") =!= 0L)
        .select("k", "sx").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val viaTable = graft.streaming.Streams.latestTable(spark, tgt).get
        .select("k", "x").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaFeed == viaTable,
        s"feed-maintained aggregate diverged after restart:\n" +
          s"$viaFeed\nvs\n$viaTable")
      assert(viaFeed == Seq((1L, 11.0), (2L, 21.0), (4L, 40.0)))
    } finally q.stop()
    // refusals: a stream over the resolved table (no changelog option)
    // lacks the capability; a snapshot target refuses the option itself
    val exTable = intercept[Exception] {
      spark.readStream.format("graft").load(tgt)
        .writeStream.format("memory").queryName("graft_refuse1")
        .option("checkpointLocation", tmp("graft-dsv2-r1"))
        .outputMode(OutputMode.Append()).start()
    }
    assert(exTable.getMessage.contains("does not support streamed reading") ||
      exTable.getMessage.contains("MICRO_BATCH_READ"),
      s"unexpected refusal: ${exTable.getMessage}")
    val snapTgt2 = tmp("graft-dsv2-snapstream")
    val snapIn2 = MemoryStream[(String, Double)]
    val sq2 = graft.streaming.Streams.aggSnapshotSinkAppendOnly(
      snapIn2.toDF().toDF("k", "v"), snapTgt2, tmp("graft-dsv2-snapstreamck"),
      Seq("k"), Seq("v"))
    try {
      snapIn2.addData(("a", 1.0)); sq2.processAllAvailable()
    } finally sq2.stop()
    val exSnap = intercept[Exception](
      spark.readStream.format("graft").option("changelog", true)
        .load(snapTgt2))
    assert(exSnap.getMessage.contains("merge tables only"))
  }

  test("readStream changelog maxVersionsPerTrigger paces catch-up: " +
      "bounded offset advance per microbatch, final state unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    def tmp(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString
    val tgt = tmp("graft-dsv2-pace")
    val in = MemoryStream[(Long, Double, Long, Boolean)]
    val q = graft.streaming.Streams.mergeSink(
      in.toDF().toDF("k", "x", "seq", "del"), tgt,
      tmp("graft-dsv2-paceck"), Seq("k"), "seq", "del", changelog = true)
    try {
      (0 until 4).foreach { i =>
        in.addData((i.toLong % 2, 10.0 + i, i.toLong, false))
        q.processAllAvailable()
      }
    } finally q.stop()
    // a catching-up consumer: 4 committed versions, paced 1 per trigger
    val c = spark.readStream.format("graft").option("changelog", true)
      .option("maxVersionsPerTrigger", 1).load(tgt)
      .groupBy("k").agg(sum(col("op") * col("x")).as("sx"))
      .writeStream.format("memory").queryName("graft_paced")
      .option("checkpointLocation", tmp("graft-dsv2-paceconsck"))
      .outputMode(OutputMode.Complete()).start()
    try c.processAllAvailable() finally c.stop()
    // every data-bearing microbatch advanced by at most one version
    val dataBatches = c.recentProgress.filter(_.numInputRows > 0)
    assert(dataBatches.length >= 4,
      s"pacing must split the catch-up into >= 4 microbatches, got " +
        s"${dataBatches.length}")
    val viaFeed = spark.table("graft_paced").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaTable = graft.streaming.Streams.latestTable(spark, tgt).get
      .select("k", "x").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaFeed == viaTable,
      s"paced consumption diverged: $viaFeed vs $viaTable")
    // the option is a feed pacer: refuse without changelog
    val ex = intercept[Exception](spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", 1).load(tgt))
    assert(ex.getMessage.contains("maxVersionsPerTrigger"))
  }

  test("format(\"graft\") write face: SQL INSERT and df.write apply one " +
      "version each (upsert/delete, feed keeps emitting, compaction " +
      "folds); snapshots, feeds, overwrite, and live-sink targets refuse") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    def tmp(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString
    val tgt = tmp("graft-dsv2-write")
    // CREATE on first write (feed on from the start), then mutate via
    // SQL and the writer API only — no streaming sink anywhere
    val v0 = graft.streaming.Streams.mergeTableInsert(spark, tgt,
      Seq((1L, "a1", 10.0), (2L, "b1", 20.0)).toDF("k", "v", "x"),
      createKeys = Seq("k"), changelog = true)
    assert(v0 == 0L)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW w_sql " +
      s"USING graft OPTIONS (path '$tgt')")
    // SQL INSERT: an upsert of k=1 and a fresh k=3, one version
    spark.sql("INSERT INTO w_sql VALUES (1, 'a2', 11.0), (3, 'c1', 30.0)")
    def served: Seq[(Long, String, Double)] =
      graft.streaming.Streams.latestTable(spark, tgt).get
        .select("k", "v", "x").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSeq
    assert(served == Seq((1L, "a2", 11.0), (2L, "b1", 20.0),
      (3L, "c1", 30.0)), s"SQL insert not applied: $served")
    // the format read face serves the same rows (same provider, both
    // directions), and the view sees its own insert
    assert(spark.sql("SELECT count(*) FROM w_sql").head.getLong(0) == 3L)
    // the feed kept emitting: the upsert derived a retraction of a1
    val feed = graft.streaming.Streams.changelogOf(spark, tgt)
    assert(!feed.filter(col("op") === -1 && col("v") === "a1").isEmpty,
      "external write did not derive the retraction")
    // writer API: tombstone k=2 (values ignored), one more version
    Seq((2L, "", 0.0)).toDF("k", "v", "x")
      .write.format("graft").option("delete", true).mode("append").save(tgt)
    assert(served == Seq((1L, "a2", 11.0), (3L, "c1", 30.0)))
    assert(!graft.streaming.Streams.changelogOf(spark, tgt)
      .filter(col("op") === -1 && col("v") === "b1").isEmpty,
      "tombstone write did not derive the retraction")
    // compaction folds external layers exactly like sink layers
    val folded = graft.streaming.Streams.maintainArtifact(spark, tgt,
      targetFiles = 1, minBatches = 1)
    assert(folded.exists(r => r._1 == "rows" && r._2.isDefined))
    assert(served == Seq((1L, "a2", 11.0), (3L, "c1", 30.0)),
      "compaction changed the served table")
    // in-batch duplicate keys refuse (one write is one version)
    val exDup = intercept[Exception](spark.sql(
      "INSERT INTO w_sql VALUES (5, 'x', 1.0), (5, 'y', 2.0)"))
    assert(exDup.getMessage.contains("duplicate keys"))
    // overwrite refuses loudly
    val exOw = intercept[Exception](
      Seq((9L, "z", 9.0)).toDF("k", "v", "x")
        .write.format("graft").mode("overwrite").save(tgt))
    assert(exOw.getMessage.contains("overwrite") ||
      exOw.getMessage.contains("truncate"), exOw.getMessage)
    // a snapshot target refuses writes
    val snapTgt = tmp("graft-dsv2-wsnap")
    val snapIn = MemoryStream[(String, Double)]
    val sq = graft.streaming.Streams.aggSnapshotSinkAppendOnly(
      snapIn.toDF().toDF("k", "v"), snapTgt, tmp("graft-dsv2-wsnapck"),
      Seq("k"), Seq("v"))
    try { snapIn.addData(("a", 1.0)); sq.processAllAvailable() }
    finally sq.stop()
    // a schema-matching write (round-tripping the snapshot's own row)
    // reaches the provider's refusal rather than schema validation
    val exSnap = intercept[Exception](
      spark.read.format("graft").load(snapTgt).limit(1)
        .write.format("graft").mode("append").save(snapTgt))
    assert(exSnap.getMessage.contains("derived state"), exSnap.getMessage)
    // a LIVE sink's target refuses external writes (batch numbering)
    val liveTgt = tmp("graft-dsv2-wlive")
    val liveIn = MemoryStream[(Long, String, Long, Boolean)]
    val lq = graft.streaming.Streams.mergeSink(
      liveIn.toDF().toDF("k", "v", "seq", "del"), liveTgt,
      tmp("graft-dsv2-wliveck"), Seq("k"), "seq", "del")
    try {
      liveIn.addData((1L, "a", 1L, false)); lq.processAllAvailable()
      val exLive = intercept[Exception](
        Seq((2L, "b")).toDF("k", "v")
          .write.format("graft").mode("append").save(liveTgt))
      assert(exLive.getMessage.contains("_query"), exLive.getMessage)
    } finally lq.stop()
  }

  test("format(\"graft\") reads are version-pinned at planning: a commit " +
      "between plan and execution cannot shift the read") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    def tmp(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(col): _*).orderBy(cols.map(col): _*)
        .collect().map(_.toString).toSeq
    }
    val tgt = tmp("graft-dsv2-pin")
    val in = MemoryStream[(Long, String, Long, Boolean)]
    val q = graft.streaming.Streams.mergeSink(
      in.toDF().toDF("k", "v", "seq", "del"), tgt,
      tmp("graft-dsv2-pinck"), Seq("k"), "seq", "del")
    try {
      in.addData((1L, "a1", 1L, false)); q.processAllAvailable()
      in.addData((2L, "b1", 1L, false)); q.processAllAvailable()
    } finally q.stop()
    // PLAN the read (load() resolves the provider and pins the
    // committed version), then land a FOREIGN commit — another
    // session's sink, simulated at the filesystem level so this
    // session's commit epoch never moves
    val planned = spark.read.format("graft").load(tgt)
    val expectAtPlan = canon(
      graft.streaming.Streams.latestTable(spark, tgt).get)
    Seq((1L, "a2", 2L, false), (3L, "c1", 1L, false))
      .toDF("k", "v", "seq", "del")
      .write.parquet(s"$tgt/rows/batch=2")
    assert(new java.io.File(s"$tgt/v=2").mkdirs())
    assert(new java.io.File(s"$tgt/v=2/_SUCCESS").createNewFile())
    // the planned read keeps serving its pinned version — on the first
    // action AND on a second one (no per-action re-resolution drift
    // under foreign commits)
    assert(canon(planned) == expectAtPlan,
      "planned read shifted to a version committed after planning")
    assert(planned.count() == expectAtPlan.size.toLong)
    // a self-join of the planned read resolves ONE version on both
    // sides — one pin per planning, never blended
    assert(planned.as("l").join(planned.as("r"), "k")
      .filter(col("l.v") =!= col("r.v")).isEmpty,
      "self-join saw two versions of one table")
    // a FRESH load re-resolves and serves the foreign commit; explicit
    // asOf still time-travels
    assert(canon(spark.read.format("graft").load(tgt)) ==
      canon(graft.streaming.Streams.latestTable(spark, tgt).get))
    assert(spark.read.format("graft").load(tgt).count() == 3L)
    assert(canon(spark.read.format("graft").option("asOf", 1L).load(tgt)) ==
      expectAtPlan, "asOf=1 must equal the state at planning time")
    // a LOCAL commit (this session's writer) moves the epoch: the SAME
    // handle serves the fresh version at its next planning — a SQL
    // view over a live table never freezes at creation. (Deleting
    // _query is the documented adoption step for external writes to a
    // retired sink target.)
    assert(new java.io.File(s"$tgt/_query").delete())
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      Seq((4L, "d1")).toDF("k", "v"))
    assert(planned.count() == 4L,
      "local commit must re-pin the handle's next planning")
  }

  test("write face under RACING writers: exclusive claims land " +
      "concurrent writes in distinct versions, both rows survive; torn " +
      "writes reclaim only past the in-flight window") {
    import spark.implicits._
    val tgt = java.nio.file.Files.createTempDirectory("graft-race").toString
    val fs = new org.apache.hadoop.fs.Path(tgt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    def exists(s: String) = fs.exists(p(s))
    val v0 = graft.streaming.Streams.mergeTableInsert(spark, tgt,
      Seq((1L, "base")).toDF("k", "v"), createKeys = Seq("k"))
    assert(v0 == 0L)
    // writer A mid-flight: claim staked (fresh), layer written, commit
    // NOT yet landed — exactly the state between fs.create(_CLAIM) and
    // _SUCCESS in mergeTableInsert
    fs.create(p(s"$tgt/v=1/_CLAIM"), false).close()
    Seq((10L, "a-inflight")).toDF("k", "v")
      .withColumn("__seq", lit(0L)).withColumn("__del", lit(false))
      .coalesce(1).write.parquet(s"$tgt/rows/batch=1")
    // writer B races: must move PAST A's claim, never destroy its layer
    val vb = graft.streaming.Streams.mergeTableInsert(spark, tgt,
      Seq((2L, "b-row")).toDF("k", "v"))
    assert(vb == 2L, s"racing writer must claim the NEXT free id, got $vb")
    assert(exists(s"$tgt/rows/batch=1"),
      "writer B reclaimed writer A's in-flight layer")
    assert(!exists(s"$tgt/v=1/_SUCCESS") && exists(s"$tgt/v=2/_SUCCESS"))
    // writer A completes: both committed-intent rows are served, in
    // distinct versions — never silent loss
    fs.create(p(s"$tgt/v=1/_SUCCESS"), true).close()
    spark.catalog.refreshByPath(tgt)
    val served = graft.streaming.Streams.latestTable(spark, tgt).get
      .select("k").as[Long].collect().sorted.toSeq
    assert(served == Seq(1L, 2L, 10L), s"lost a racing write: $served")
    // an EXPIRED claim (crashed writer) is reclaimed: garbage layer and
    // claim dir cleared, the id re-used by the next write
    fs.create(p(s"$tgt/v=3/_CLAIM"), false).close()
    Seq((99L, "torn")).toDF("k", "v")
      .withColumn("__seq", lit(0L)).withColumn("__del", lit(false))
      .coalesce(1).write.parquet(s"$tgt/rows/batch=3")
    val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    fs.setTimes(p(s"$tgt/v=3/_CLAIM"), old, -1)
    val vc = graft.streaming.Streams.mergeTableInsert(spark, tgt,
      Seq((4L, "after-reclaim")).toDF("k", "v"))
    assert(vc == 3L, s"expired claim's id must be reclaimed and re-used: $vc")
    spark.catalog.refreshByPath(tgt)
    val served2 = graft.streaming.Streams.latestTable(spark, tgt).get
      .select("k").as[Long].collect().sorted.toSeq
    assert(!served2.contains(99L), "torn layer's rows leaked into the table")
    assert(served2.contains(4L))
    // a CLAIMLESS torn layer (pre-claim-protocol leftover) is reclaimed
    // unconditionally — no claim means no writer can own it
    Seq((88L, "legacy-torn")).toDF("k", "v")
      .withColumn("__seq", lit(0L)).withColumn("__del", lit(false))
      .coalesce(1).write.parquet(s"$tgt/rows/batch=9")
    val vd = graft.streaming.Streams.mergeTableInsert(spark, tgt,
      Seq((5L, "tail")).toDF("k", "v"))
    assert(vd == 4L)
    assert(!exists(s"$tgt/rows/batch=9"),
      "claimless torn layer must be reclaimed")
    spark.catalog.refreshByPath(tgt)
    assert(!graft.streaming.Streams.latestTable(spark, tgt).get
      .select("k").as[Long].collect().contains(88L))
  }

  test("a writer that outlives the in-flight window REFUSES at commit " +
      "instead of publishing over a reclaimed claim: the racer's version " +
      "stands, nothing is lost silently") {
    import spark.implicits._
    val tgt = java.nio.file.Files.createTempDirectory("graft-slow").toString
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      Seq((1L, "base")).toDF("k", "v"), createKeys = Seq("k"))
    // interleave a racer into the slow writer's claim window: expire
    // the slow writer's claim (simulating a write that outlived
    // inFlightClaimMs), then run a full racing insert — it reclaims
    // the id, claims it itself, and commits
    graft.streaming.Streams.mergeInsertInterleave = Some { dir =>
      graft.streaming.Streams.mergeInsertInterleave = None
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$dir/v=1/_CLAIM"),
        System.currentTimeMillis() - 2L * 60 * 60 * 1000, -1)
      graft.streaming.Streams.mergeTableInsert(spark, dir,
        Seq((7L, "racer")).toDF("k", "v"))
    }
    try {
      val ex = intercept[IllegalArgumentException](
        graft.streaming.Streams.mergeTableInsert(spark, tgt,
          Seq((5L, "slow")).toDF("k", "v")))
      assert(ex.getMessage.contains("no longer this writer's"),
        ex.getMessage)
    } finally graft.streaming.Streams.mergeInsertInterleave = None
    spark.catalog.refreshByPath(tgt)
    val served = graft.streaming.Streams.latestTable(spark, tgt).get
      .select("k").as[Long].collect().sorted.toSeq
    assert(served == Seq(1L, 7L),
      s"racer's version must stand, slow writer's must not publish: $served")
  }

  test("pin memoized per query execution: a same-JVM commit between two " +
      "scan-builder creations of ONE planning cannot split the plan " +
      "across two versions; the NEXT planning re-pins") {
    import spark.implicits._
    val tgt = java.nio.file.Files.createTempDirectory("graft-pinexec").toString
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      Seq((1L, "a")).toDF("k", "v"), createKeys = Seq("k"))
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("path", tgt))
    val provider = new graft.sources.v2.GraftDataSource
    val schema = provider.inferSchema(opts)
    val table = provider
      .getTable(schema, Array.empty, opts.asCaseSensitiveMap())
      .asInstanceOf[graft.sources.v2.GraftTable]
    def pinOf(): Option[Long] = table.newScanBuilder(opts).build()
      .asInstanceOf[graft.sources.v2.GraftScan].ref.effectiveAsOf
    val sc = spark.sparkContext
    val KEY = org.apache.spark.sql.execution.SQLExecution.EXECUTION_ID_KEY
    val saved = sc.getLocalProperty(KEY)
    try {
      sc.setLocalProperty(KEY, "graft-spec-planning-1")
      val p1 = pinOf()
      assert(p1.contains(0L))
      // a LOCAL commit lands between the two builder creations of the
      // SAME planning (epoch moves) — the second builder must reuse
      // the planning's pin, not re-pin to the fresh version
      graft.streaming.Streams.mergeTableInsert(spark, tgt,
        Seq((2L, "b")).toDF("k", "v"))
      val p2 = pinOf()
      assert(p2 == p1,
        s"one planning split across two versions: $p1 then $p2")
      // a NEW planning re-pins: the freshness contract
      sc.setLocalProperty(KEY, "graft-spec-planning-2")
      assert(pinOf().contains(1L),
        "next planning after a local commit must serve the new version")
    } finally sc.setLocalProperty(KEY, saved)
  }

  test("changelog stream serves ARRAY columns: token-id and float-" +
      "embedding arrays round-trip the executor-side reader identically " +
      "to the batch feed read, including null arrays and null elements") {
    import spark.implicits._
    val tgt = java.nio.file.Files.createTempDirectory("graft-arr").toString
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      Seq((1L, Seq(1L, 2L, 3L), Seq(0.5f, 1.5f)),
        (2L, Seq(10L), Seq(2.0f))).toDF("k", "tokens", "emb"),
      createKeys = Seq("k"), changelog = true)
    // upsert with a NULL element; a row with a NULL array; an ADDED
    // typed-metadata STRUCT column (the multimodal shape — older
    // layers must surface it as null); a delete — every shape the
    // reader must not mangle
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      spark.range(1).selectExpr("1L AS k",
        "array(7L, CAST(NULL AS BIGINT)) AS tokens",
        "CAST(NULL AS ARRAY<FLOAT>) AS emb",
        "named_struct('w', 640, 'fmt', 'png') AS meta"))
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      spark.range(1).selectExpr("3L AS k",
        "CAST(NULL AS ARRAY<BIGINT>) AS tokens",
        "array(CAST(1.25 AS FLOAT), CAST(-2.5 AS FLOAT)) AS emb",
        "CAST(NULL AS STRUCT<w:INT, fmt:STRING>) AS meta"))
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      spark.range(1).selectExpr("2L AS k",
        "CAST(array() AS ARRAY<BIGINT>) AS tokens",
        "CAST(array() AS ARRAY<FLOAT>) AS emb",
        "CAST(NULL AS STRUCT<w:INT, fmt:STRING>) AS meta"),
      delete = true)
    // canonicalize both paths through the same Catalyst JSON
    // serialization (collection toString is not stable across readers)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.selectExpr("to_json(struct(*)) AS j").as[String]
        .collect().sorted.toSeq
    val streamFeed = spark.readStream.format("graft")
      .option("changelog", true).load(tgt)
    assert(streamFeed.schema("tokens").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = streamFeed.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-arrck").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        canon(b).foreach(buf.add)
      }.start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val streamed = buf.iterator.asScala.toSeq.sorted
    val batch = canon(graft.streaming.Streams.changelogOf(spark, tgt))
    assert(streamed == batch,
      s"stream decode diverged from the batch feed:\n${
        streamed.zipAll(batch, "<missing>", "<missing>")
          .filter(p => p._1 != p._2).take(5).mkString("\n")}")
    assert(streamed.exists(_.contains("[7")), "upserted array missing")
    assert(streamed.exists(_.contains("\"fmt\":\"png\"")),
      "struct metadata missing from the streamed feed")
  }

  test("changelog stream serves MAP and ARRAY-OF-STRUCT columns: the " +
      "full nested algebra round-trips the executor-side reader " +
      "identically to the batch feed read, including null maps, null " +
      "values, empty collections, and struct-subfield ADD evolution") {
    import spark.implicits._
    val tgt = java.nio.file.Files.createTempDirectory("graft-nest").toString
    // map<string,bigint> + array<struct<t,w>>: the feature-bag and
    // weighted-token shapes a training pipeline ships
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      spark.range(1).selectExpr("1L AS k",
        "map('a', 1L, 'b', 2L) AS feat",
        "array(named_struct('t', 10L, 'w', 2L), " +
          "named_struct('t', 20L, 'w', 3L)) AS toks"),
      createKeys = Seq("k"), changelog = true)
    // null map value, empty array; then null collections wholesale
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      spark.range(1).selectExpr("2L AS k",
        "map('x', CAST(NULL AS BIGINT)) AS feat",
        "CAST(array() AS ARRAY<STRUCT<t:BIGINT, w:BIGINT>>) AS toks"))
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      spark.range(1).selectExpr("3L AS k",
        "CAST(NULL AS MAP<STRING, BIGINT>) AS feat",
        "CAST(NULL AS ARRAY<STRUCT<t:BIGINT, w:BIGINT>>) AS toks"))
    // ADD evolution at depth: a struct whose ELEMENT type gains a
    // subfield, and a map-valued struct column — older layers must
    // surface the missing pieces as null, newer layers serve them
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      spark.range(1).selectExpr("4L AS k",
        "map('z', 9L) AS feat",
        "array(named_struct('t', 30L, 'w', 4L, 'lang', 'en')) AS toks",
        "named_struct('tags', map('q', 0.5D), " +
          "'ids', array(7L, CAST(NULL AS BIGINT))) AS meta"))
    graft.streaming.Streams.mergeTableInsert(spark, tgt,
      spark.range(1).selectExpr("2L AS k",
        "CAST(NULL AS MAP<STRING, BIGINT>) AS feat",
        "CAST(NULL AS ARRAY<STRUCT<t:BIGINT, w:BIGINT, lang:STRING>>) " +
          "AS toks",
        "CAST(NULL AS STRUCT<tags:MAP<STRING,DOUBLE>, " +
          "ids:ARRAY<BIGINT>>) AS meta"),
      delete = true)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.selectExpr("to_json(struct(*)) AS j").as[String]
        .collect().sorted.toSeq
    val streamFeed = spark.readStream.format("graft")
      .option("changelog", true).load(tgt)
    import org.apache.spark.sql.types._
    assert(streamFeed.schema("feat").dataType ==
      MapType(StringType, LongType))
    assert(streamFeed.schema("toks").dataType.isInstanceOf[ArrayType] &&
      streamFeed.schema("toks").dataType.asInstanceOf[ArrayType]
        .elementType.isInstanceOf[StructType])
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = streamFeed.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-nestck").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        canon(b).foreach(buf.add)
      }.start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val streamed = buf.iterator.asScala.toSeq.sorted
    val batch = canon(graft.streaming.Streams.changelogOf(spark, tgt))
    assert(streamed == batch,
      s"stream decode diverged from the batch feed:\n${
        streamed.zipAll(batch, "<missing>", "<missing>")
          .filter(p => p._1 != p._2).take(5).mkString("\n")}")
    assert(streamed.exists(s =>
      s.contains("\"a\":1") && s.contains("\"b\":2")), "map entries missing")
    assert(streamed.exists(s =>
      s.contains("\"t\":30") && s.contains("\"lang\":\"en\"")),
      "evolved array-of-struct element missing")
    assert(streamed.exists(_.contains("\"q\":0.5")),
      "map nested inside struct missing")
  }

  test("changelog stream sinceVersion above the committed max never " +
      "regresses: versions the cut excluded are never served") {
    import spark.implicits._
    val tgt = java.nio.file.Files.createTempDirectory("graft-clamp").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-clampck").toString
    def insert(k: Long): Long = graft.streaming.Streams.mergeTableInsert(
      spark, tgt, Seq((k, s"v$k")).toDF("k", "v"),
      createKeys = Seq("k"), changelog = true)
    (1L to 3L).foreach(insert) // versions 0, 1, 2
    // foreachBatch sink: supports checkpoint recovery (memory does not)
    def drain(): Seq[Long] = {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.format("graft").option("changelog", true)
        .option("sinceVersion", 5).load(tgt)
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("batch").distinct().collect()
            .foreach(r => seen.add(r.getLong(0)))
        }.start()
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      seen.iterator.asScala.toSeq.distinct.sorted
    }
    // cut above the committed max: nothing to serve, and the offset
    // recorded must hold AT the cut, not regress to the committed max
    assert(drain().isEmpty,
      "sinceVersion above the committed max must serve nothing")
    (4L to 7L).foreach(insert) // versions 3..6
    // resume: only versions ABOVE the cut may appear — an unclamped
    // offset would have recorded 2 and double-served versions 3..5
    val served = drain()
    assert(served == Seq(6L),
      s"versions excluded by sinceVersion were served: $served")
  }
}
