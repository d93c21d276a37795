package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Layout
import graft.plans.SkipRewrite

/** Auto-consulted file skipping: a plain `WHERE key = x` over a
  * registered directory scans only the files the fingerprint index
  * can't rule out, with the un-indexed tail always read — no false
  * negatives under index lag, full scan (never a wrong prune) when the
  * index can't help. */
class SkipRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Files the OPTIMIZED plan will open — the rewrite happens at
    * optimization time, so Dataset.inputFiles (analyzed plan) can't see
    * it. */
  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.length
          case _ => 0
        }
    }.sum

  test("registered point/IN lookups navigate; unregistered and non-equality shapes don't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skiprw").toString
    try {
      // hash-clustered high-cardinality key across 8 files: min/max
      // can't prune (every file spans the range), the fingerprint can
      spark.range(40000)
        .select(xxhash64(col("id")).as("uid"), (col("id") % 100).as("g"))
        .repartition(8, col("uid")).write.parquet(s"$dir/t")
      Layout.statsIndexFingerprint(spark, s"$dir/t", Seq("uid"), Seq("uid"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      val probes = spark.read.parquet(s"$dir/t")
        .limit(5).select("uid").as[Long].collect().toSeq

      // before registration: the same lookup scans everything
      def lookup(v: Long) = spark.read.parquet(s"$dir/t").filter(col("uid") === v)
      assert(scannedFiles(lookup(probes.head)) == 8)

      SkipRewrite.register(spark, s"$dir/t", s"$dir/idx")
      // every present key is FOUND (no false negatives) while the plan
      // opens a fraction of the files
      probes.foreach { v =>
        val q = lookup(v)
        assert(scannedFiles(q) <= 3, s"auto-prune opened ${scannedFiles(q)} of 8")
        assert(q.count() == 1, s"false negative for $v")
      }
      // IN-list: union of probes, still pruned, all rows found
      val inQ = spark.read.parquet(s"$dir/t")
        .filter(col("uid").isin(probes.take(3): _*))
      assert(scannedFiles(inQ) <= 5 && inQ.count() == 3)
      // a 15-value IN-list is optimized to InSet (threshold 10) — the
      // realistic multi-tenant lookup must still prune and find all 5
      // present keys among 10 absent ones
      val bigIn = spark.read.parquet(s"$dir/t")
        .filter(col("uid").isin(probes ++ (1L to 10L).map(_ + (1L << 60)): _*))
      assert(scannedFiles(bigIn) <= 7,
        s"InSet probe opened ${scannedFiles(bigIn)} of 8")
      assert(bigIn.count() == 5)
      // `k = a OR k = b` is an IN spelled as a disjunction — prunes too
      val orQ = spark.read.parquet(s"$dir/t")
        .filter(col("uid") === probes.head || col("uid") === probes(1))
      assert(scannedFiles(orQ) <= 4,
        s"OR-equality probe opened ${scannedFiles(orQ)} of 8")
      assert(orQ.count() == 2)
      // a disjunction over DIFFERENT columns can select rows any file
      // holds — must NOT prune (and must stay correct)
      val orMixed = spark.read.parquet(s"$dir/t")
        .filter(col("uid") === probes.head || col("g") === 7L)
      // (400 or 401 rows: the probed uid's own row may have g == 7)
      assert(scannedFiles(orMixed) == 8 && orMixed.count() >= 400)
      // an absent key prunes every indexed file -> empty, zero scans
      val absent = lookup(0x0123456789ABCDEFL)
      assert(scannedFiles(absent) == 0 && absent.count() == 0)
      // a non-equality filter is left alone (full scan, correct rows)
      val range = spark.read.parquet(s"$dir/t").filter(col("uid") > 0L)
      assert(scannedFiles(range) == 8)
      // a non-fingerprinted column doesn't navigate
      val other = spark.read.parquet(s"$dir/t").filter(col("g") === 7L)
      assert(scannedFiles(other) == 8 && other.count() == 400)
      // equality AND extra row-level predicate: prunes on the equality,
      // keeps the whole filter row-level
      val mixed = spark.read.parquet(s"$dir/t")
        .filter(col("uid") === probes.head && col("g") >= 0L)
      assert(scannedFiles(mixed) <= 3 && mixed.count() == 1)
      SkipRewrite.unregister(s"$dir/t")
      assert(scannedFiles(lookup(probes.head)) == 8,
        "unregister must restore the full scan")
    } finally {
      SkipRewrite.unregister(s"$dir/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("range predicates auto-prune off the min/max stats (no fingerprints needed)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skiprw-rg").toString
    try {
      // RANGE-clustered layout: each file holds a narrow id band, so a
      // box query intersects few files — the time-range dashboard shape
      spark.range(80000).select(col("id").as("ts"), (col("id") % 7).as("g"))
        .repartitionByRange(8, col("ts")).write.parquet(s"$dir/t")
      // a plain stats index — no fingerprints — serves range pruning
      Layout.statsIndex(spark, s"$dir/t", Seq("ts"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      SkipRewrite.register(spark, s"$dir/t", s"$dir/idx")
      val between = spark.read.parquet(s"$dir/t")
        .filter(col("ts").between(20000L, 21000L))
      assert(scannedFiles(between) <= 2,
        s"range auto-prune opened ${scannedFiles(between)} of 8")
      assert(between.count() == 1001)
      // one-sided bound prunes too
      val tail = spark.read.parquet(s"$dir/t").filter(col("ts") >= 75000L)
      assert(scannedFiles(tail) <= 2 && tail.count() == 5000)
      // exclusive bounds stay exact (probed inclusively — conservative)
      val excl = spark.read.parquet(s"$dir/t")
        .filter(col("ts") > 19999L && col("ts") < 21001L)
      assert(scannedFiles(excl) <= 2 && excl.count() == 1001)
      // an out-of-domain box prunes everything
      val none = spark.read.parquet(s"$dir/t").filter(col("ts") > 1000000L)
      assert(scannedFiles(none) == 0 && none.count() == 0)
      // a point lookup on the stats-only column box-prunes as the
      // degenerate range [v, v] — no fingerprints needed on a
      // range-clustered layout
      val eq = spark.read.parquet(s"$dir/t").filter(col("ts") === 20500L)
      assert(scannedFiles(eq) <= 2 && eq.count() == 1)
      // a sparse IN-list prunes to the POINT files, not the list's
      // [min, max] envelope — each value is box-checked individually,
      // so the ~6 files between the two probed points stay closed
      val sparseIn = spark.read.parquet(s"$dir/t")
        .filter(col("ts").isin(100L, 79000L))
      assert(scannedFiles(sparseIn) <= 2,
        s"sparse IN opened ${scannedFiles(sparseIn)} of 8 — envelope, not points")
      assert(sparseIn.count() == 2)
    } finally {
      SkipRewrite.unregister(s"$dir/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("timestamp/date range predicates auto-prune; exact across session-tz changes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skiprw-ts").toString
    try {
      // one year of hourly events, time-clustered — the dashboard layout
      val rows = spark.range(24L * 365)
        .select(timestamp_seconds(lit(1704067200L) + col("id") * 3600).as("ts"),
          (col("id") % 7).as("g"),
          to_date(timestamp_seconds(lit(1704067200L) + col("id") * 3600)).as("d"))
      rows.repartitionByRange(12, col("ts")).write.parquet(s"$dir/t")
      Layout.statsIndex(spark, s"$dir/t", Seq("ts", "d"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      SkipRewrite.register(spark, s"$dir/t", s"$dir/idx")
      // string literals coerce to TimestampType at analysis — the house
      // predicate shape — and the folded literal is an absolute instant
      def feb = spark.read.parquet(s"$dir/t")
        .filter(col("ts") >= "2024-02-01" && col("ts") < "2024-03-01")
      assert(scannedFiles(feb) <= 3,
        s"timestamp range auto-prune opened ${scannedFiles(feb)} of 12")
      assert(feb.count() == 29L * 24)
      // DATE column ranges prune off the same stats
      val weekD = spark.read.parquet(s"$dir/t")
        .filter(col("d").between(lit("2024-06-01").cast("date"),
          lit("2024-06-07").cast("date")))
      assert(scannedFiles(weekD) <= 3,
        s"date range auto-prune opened ${scannedFiles(weekD)} of 12")
      assert(weekD.count() == 7L * 24)
      // tz robustness: the SAME query text under a different session tz
      // resolves its literal to a different instant, but pruning stays
      // a pure instant-vs-instant compare — answer == full scan, and no
      // false negative appears (prune still engaged)
      val tz0 = spark.conf.get("spark.sql.session.timeZone")
      try {
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        val febTokyo = spark.read.parquet(s"$dir/t")
          .filter(col("ts") >= "2024-02-01" && col("ts") < "2024-03-01")
        SkipRewrite.unregister(s"$dir/t")
        val direct = spark.read.parquet(s"$dir/t")
          .filter(col("ts") >= "2024-02-01" && col("ts") < "2024-03-01")
          .count()
        SkipRewrite.register(spark, s"$dir/t", s"$dir/idx")
        assert(scannedFiles(febTokyo) <= 3, "tz change disabled pruning")
        assert(febTokyo.count() == direct,
          "timestamp pruning diverged from the full scan under a tz change")
      } finally spark.conf.set("spark.sql.session.timeZone", tz0)
      // date/timestamp EQUALITY prunes too — as the degenerate range
      // [v, v] (probeValue rejects these literals for fingerprints, but
      // the box compare is exact)
      val eqD = spark.read.parquet(s"$dir/t")
        .filter(col("d") === lit("2024-06-03").cast("date"))
      assert(scannedFiles(eqD) <= 3,
        s"date equality opened ${scannedFiles(eqD)} of 12")
      assert(eqD.count() == 24)
      val eqT = spark.read.parquet(s"$dir/t")
        .filter(col("ts") === "2024-02-10 05:00:00")
      assert(scannedFiles(eqT) <= 3 && eqT.count() == 1,
        "timestamp equality did not box-prune")
      // a date IN-list prunes by its [min, max] envelope (adjacent-days
      // dashboard shape)
      val inD = spark.read.parquet(s"$dir/t")
        .filter(col("d").isin(
          java.sql.Date.valueOf("2024-06-02"),
          java.sql.Date.valueOf("2024-06-04"),
          java.sql.Date.valueOf("2024-06-03")))
      assert(scannedFiles(inD) <= 3,
        s"date IN-list opened ${scannedFiles(inD)} of 12")
      assert(inD.count() == 3L * 24)
      // doubles stay out: a fractional range must NOT navigate
      val dbl = spark.read.parquet(s"$dir/t")
        .filter(col("g").cast("double") >= 1.5 && col("g").cast("double") <= 3.5)
      assert(scannedFiles(dbl) == 12, "a double range should bail to the full scan")
    } finally {
      SkipRewrite.unregister(s"$dir/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("index lag: a key only in a not-yet-indexed file is still found (tail read unpruned)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skiprw-tail").toString
    try {
      spark.range(40000)
        .select(xxhash64(col("id")).as("uid"), (col("id") % 100).as("g"))
        .repartition(8, col("uid")).write.parquet(s"$dir/t")
      Layout.statsIndexFingerprint(spark, s"$dir/t", Seq("uid"), Seq("uid"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      SkipRewrite.register(spark, s"$dir/t", s"$dir/idx")
      // ingestion races ahead of the index: one fresh file lands with a
      // key that exists NOWHERE else
      val planted = 0x7EA11FEEDL
      Seq((planted, 999L)).toDF("uid", "g")
        .coalesce(1).write.mode("append").parquet(s"$dir/t")
      val q = spark.read.parquet(s"$dir/t").filter(col("uid") === planted)
      // found — the un-indexed tail is always read
      assert(q.count() == 1, "stale index lost a tail row")
      // and still pruned: the 8 indexed files are fingerprint-skipped,
      // only the tail (plus fingerprint false positives) is opened
      assert(scannedFiles(q) <= 3,
        s"tail lookup opened ${scannedFiles(q)} of 9 files")
      // refreshing the index in place absorbs the tail on the NEXT query
      Layout.statsIndexUpdate(spark, s"$dir/t", Seq("uid"),
          spark.read.parquet(s"$dir/idx"))
        .write.mode("overwrite").parquet(s"$dir/idx2")
      spark.read.parquet(s"$dir/idx2").write.mode("overwrite").parquet(s"$dir/idx")
      val q2 = spark.read.parquet(s"$dir/t").filter(col("uid") === planted)
      assert(q2.count() == 1 && scannedFiles(q2) <= 3)
    } finally {
      SkipRewrite.unregister(s"$dir/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("SkipRewrite and MvRewrite coexist on one base: aggregates navigate, lookups prune") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skiprw-mv").toString
    val base = s"$dir/t"
    try {
      spark.range(40000)
        .select(xxhash64(col("id")).as("uid"),
          concat(lit("g"), (col("id") % 4).cast("string")).as("g"),
          (col("id") % 17).cast("double").as("v"))
        .repartition(8, col("uid")).write.parquet(base)
      graft.ops.Cdc.aggSnapshot(spark.read.parquet(base), Seq("g"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      graft.plans.MvRewrite.register(spark, base, Seq("g"), Seq("v"), s"$dir/snap")
      Layout.statsIndexFingerprint(spark, base, Seq("uid"), Seq("uid"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      SkipRewrite.register(spark, base, s"$dir/idx")
      // the dashboard aggregate navigates to the snapshot — MvRewrite
      // wins before SkipRewrite ever sees a filter
      val agg = spark.read.parquet(base).groupBy("g").agg(sum("v").as("s"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(aggPlan.contains(s"$dir/snap") && !aggPlan.contains(base),
        s"aggregate did not navigate to the snapshot:\n$aggPlan")
      // the point lookup prunes files — SkipRewrite's territory
      val probe = spark.read.parquet(base).limit(1).select("uid").as[Long]
        .collect().head
      val look = spark.read.parquet(base).filter(col("uid") === probe)
      assert(scannedFiles(look) <= 3 && look.count() == 1)
      // an aggregate MvRewrite must bail on (non-key filter) still gets
      // SkipRewrite's file pruning on the equality
      val mixed = spark.read.parquet(base)
        .filter(col("uid") === probe)
        .groupBy("g").agg(sum("v").as("s"))
      val mixedPlan = mixed.queryExecution.optimizedPlan
      assert(!mixedPlan.toString.contains(s"$dir/snap"),
        "non-key filter must not navigate the snapshot")
      assert(scannedFiles(mixed) <= 3,
        s"pruning lost under the aggregate: ${scannedFiles(mixed)} of 8")
      val got = mixed.collect().map(_.getDouble(1)).sum
      val want = spark.read.parquet(base).filter(col("uid") === probe)
        .agg(sum("v")).collect().head.getDouble(0)
      assert(math.abs(got - want) < 1e-9, s"$got vs $want")
    } finally {
      graft.plans.MvRewrite.unregister(base)
      SkipRewrite.unregister(base)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("versioned registration tracks skippingIndexSink; trails safely under lag") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skiprw-v").toString
    val base = s"$dir/base"; val target = s"$dir/idx"; val ckpt = s"$dir/ck"
    try {
      def land(lo: Int, hi: Int): Unit =
        (lo until hi).map(i => (i.toLong * 7919L, s"p$i")).toDF("uid", "payload")
          .repartition(2).write.mode("append").parquet(base)
      land(0, 400)
      // registration BEFORE any committed version: full scan, no error
      SkipRewrite.registerVersioned(spark, base, target)
      val early = spark.read.parquet(base).filter(col("uid") === 7919L)
      assert(scannedFiles(early) == 2 && early.count() == 1)
      val q = graft.streaming.Streams.skippingIndexSink(
        spark.readStream.schema("uid long, payload string").parquet(base),
        target, ckpt, Seq("uid"), fpCols = Seq("uid"))
      try {
        q.processAllAvailable()
        land(400, 800)
        q.processAllAvailable()
      } finally q.stop()
      // the maintained index serves auto-pruned lookups
      val v = 399L * 7919L
      val look = spark.read.parquet(base).filter(col("uid") === v)
      assert(look.count() == 1)
      assert(scannedFiles(look) < 4,
        s"versioned lookup opened ${scannedFiles(look)} of 4 files")
      // the stream is stopped; new files land that NO index version
      // covers — a planted key there must still be found
      Seq((31337L, "tail")).toDF("uid", "payload")
        .coalesce(1).write.mode("append").parquet(base)
      val tailQ = spark.read.parquet(base).filter(col("uid") === 31337L)
      assert(tailQ.count() == 1, "versioned index lag lost a tail row")
      assert(scannedFiles(tailQ) < 5,
        s"tail lookup opened ${scannedFiles(tailQ)} of 5 files")
      // compact + vacuum the maintained index: the SAME registration
      // keeps auto-pruning off the generation (resolution is
      // compaction-aware), tail row included
      assert(graft.streaming.Streams.compactIndex(spark, target, "stats",
        Seq("file"), targetFiles = 1).isDefined)
      assert(graft.streaming.Streams.vacuumIndex(spark, target, "stats").nonEmpty)
      val lookC = spark.read.parquet(base).filter(col("uid") === v)
      assert(lookC.count() == 1)
      assert(scannedFiles(lookC) < 5,
        s"post-compaction lookup opened ${scannedFiles(lookC)} of 5 files")
      assert(spark.read.parquet(base).filter(col("uid") === 31337L).count() == 1,
        "post-compaction lookup lost the un-indexed tail row")
    } finally {
      SkipRewrite.unregister(base)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("explainAcceleration: one report — MV navigated, base pruned, index staleness visible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-accel").toString
    val mvBase = s"$dir/mvbase"; val mvTgt = s"$dir/mvtgt"
    val skBase = s"$dir/skbase"; val skTgt = s"$dir/sktgt"
    try {
      // an MV-registered base maintained by the append-only sink
      Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(mvBase)
      val q1 = graft.streaming.Streams.aggSnapshotSinkAppendOnly(
        spark.readStream.schema("k string, v double").parquet(mvBase),
        mvTgt, s"$dir/mvck", Seq("k"), Seq("v"))
      try q1.processAllAvailable() finally q1.stop()
      graft.plans.MvRewrite.registerVersioned(spark, mvBase, Seq("k"),
        Seq("v"), mvTgt)
      // a skip-registered base whose maintained index TRAILS by one file
      (0 until 400).map(i => (i.toLong * 7919L, s"p$i")).toDF("uid", "payload")
        .repartition(2).write.mode("append").parquet(skBase)
      val q2 = graft.streaming.Streams.skippingIndexSink(
        spark.readStream.schema("uid long, payload string").parquet(skBase),
        skTgt, s"$dir/skck", Seq("uid"), fpCols = Seq("uid"))
      try q2.processAllAvailable() finally q2.stop()
      SkipRewrite.registerVersioned(spark, skBase, skTgt)
      Seq((31337L, "tail")).toDF("uid", "payload")
        .coalesce(1).write.mode("append").parquet(skBase) // un-indexed tail
      // ONE plan touching both artifacts: a navigated aggregate unioned
      // with a pruned lookup
      val mvSide = spark.read.parquet(mvBase).groupBy("k")
        .agg(count(lit(1)).cast("double").as("m"))
      val skSide = spark.read.parquet(skBase)
        .filter(col("uid") === 7919L)
        .groupBy(col("payload").as("k")).agg(sum(col("uid")).cast("double").as("m"))
      val df = mvSide.unionByName(skSide)
      val report = graft.plans.Acceleration.explainAcceleration(df)
      assert(report.contains("NAVIGATED"), s"MV navigation missing:\n$report")
      assert(report.contains("PRUNED — scan rewritten"),
        s"skip pruning missing:\n$report")
      // staleness: the MV is caught up (0 pending), the skip index
      // trails by exactly the one tail file
      assert(report.contains("pendingBaseFiles=0"),
        s"caught-up MV freshness missing:\n$report")
      assert(report.contains("pendingBaseFiles=1"),
        s"trailing index staleness missing:\n$report")
      assert(report.contains("version="), s"version column missing:\n$report")
    } finally {
      graft.plans.MvRewrite.unregister(mvBase)
      SkipRewrite.unregister(skBase)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("prefix predicates (LIKE 'abc%' / startswith) auto-prune string min/max boxes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skiprw-px").toString
    try {
      // source-clustered layout: sources s00..s19, one narrow band of
      // them per file — the domain/source filter of a corpus pipeline
      spark.range(20000)
        .select(format_string("s%02d", col("id") % 20).as("src"),
          col("id").as("v"))
        .repartitionByRange(8, col("src")).write.parquet(s"$dir/t")
      Layout.statsIndex(spark, s"$dir/t", Seq("src"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      SkipRewrite.register(spark, s"$dir/t", s"$dir/idx")
      def t = spark.read.parquet(s"$dir/t")

      // LIKE 'abc%' (the optimizer simplifies it to StartsWith): the
      // [prefix, successor) box opens a fraction of the files and the
      // answer matches the full-scan count exactly
      val p0 = t.filter(col("src").like("s0%"))
      assert(scannedFiles(p0) <= 5, s"prefix opened ${scannedFiles(p0)} of 8")
      assert(p0.count() == 10000)
      // startswith() spelled directly
      val p1 = t.filter(startswith(col("src"), lit("s1")))
      assert(scannedFiles(p1) <= 5 && p1.count() == 10000)
      // a narrower prefix prunes harder — one source = 1/20 of rows
      val p2 = t.filter(col("src").like("s07%"))
      assert(scannedFiles(p2) <= 2 && p2.count() == 1000)
      // a MIDDLE wildcard still prunes by the leading literal run; the
      // untouched row filter enforces the rest of the pattern
      val p3 = t.filter(col("src").like("s0%7"))
      assert(scannedFiles(p3) <= 5 && p3.count() == 1000)
      // '_' bounds the prefix too
      val p4 = t.filter(col("src").like("s1_"))
      assert(scannedFiles(p4) <= 5 && p4.count() == 10000)
      // a pattern OPENING with a wildcard has no prefix: full scan,
      // same answer
      val p5 = t.filter(col("src").like("%07"))
      assert(scannedFiles(p5) == 8 && p5.count() == 1000)
      // out-of-domain prefix prunes everything
      val p6 = t.filter(col("src").like("zzz%"))
      assert(scannedFiles(p6) == 0 && p6.count() == 0)
      // string IN over the stats-only column: per-value box checks
      val p9 = t.filter(col("src").isin("s02", "s11"))
      assert(scannedFiles(p9) <= 4 && p9.count() == 2000)
      // plain string range bounds prune off the same stats
      val p7 = t.filter(col("src") >= "s18")
      assert(scannedFiles(p7) <= 2 && p7.count() == 2000)
      val p8 = t.filter(col("src") > "s03" && col("src") < "s05")
      assert(scannedFiles(p8) <= 2 && p8.count() == 1000)
    } finally {
      SkipRewrite.unregister(s"$dir/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("prefix pruning stays sound on escapes and non-ASCII successor edges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skiprw-pe").toString
    try {
      // values that exercise the edges: a literal '%' in data, a
      // max-char prefix (no incrementable char -> lower-bound-only)
      val rows = Seq("a%x1", "a%x2", "abc1", "abd2", "퟿￿z", "zz9")
      rows.zipWithIndex.toDF("s", "v")
        .repartitionByRange(3, col("s")).write.parquet(s"$dir/t")
      Layout.statsIndex(spark, s"$dir/t", Seq("s"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      SkipRewrite.register(spark, s"$dir/t", s"$dir/idx")
      def t = spark.read.parquet(s"$dir/t")

      // escaped '%' is a literal: prefix "a%x" (answers exact; may or
      // may not prune depending on file boxes — soundness is the gate)
      val e1 = t.filter(col("s").like("a\\%x%"))
      assert(e1.count() == 2)
      // successor excludes the nearest non-match: "abd2" sits right
      // past the "abc" box and must not poison the count
      val e2 = t.filter(col("s").like("abc%"))
      assert(e2.count() == 1)
      // a prefix of non-incrementable chars prunes lower-bound-only
      // and still finds its match
      val e3 = t.filter(col("s").like("퟿￿%"))
      assert(e3.count() == 1)
      // successor carry: prefix "abc" -> successor "abd" EXCLUDES
      // "abd2" from the box only via the row filter, never a false
      // negative for "abc1"
      val e4 = t.filter(col("s").like("ab%"))
      assert(e4.count() == 2)
    } finally {
      SkipRewrite.unregister(s"$dir/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("mixed disjunctions prune by union of per-disjunct survivors; " +
      "an unprunable disjunct bails to the full scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skipor").toString
    try {
      // range-clustered key over 16 files; stats-only index (no
      // fingerprints) so the IN disjunct exercises the box-probe path
      spark.range(160000)
        .select(col("id").as("k"), (col("id") % 7).as("v"))
        .repartitionByRange(16, col("k")).write.parquet(s"$dir/t")
      Layout.statsIndex(spark, s"$dir/t", Seq("k"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      SkipRewrite.register(spark, s"$dir/t", s"$dir/idx")
      def t = spark.read.parquet(s"$dir/t")

      // range OR IN on one column: each disjunct prunes independently,
      // the plan opens their union — a few adjacent files for the
      // range, one point file each for the INs
      val mixed = t.filter(col("k").between(20000L, 29999L) ||
        col("k").isin(5L, 155555L))
      assert(scannedFiles(mixed) <= 6,
        s"union prune opened ${scannedFiles(mixed)} of 16")
      assert(mixed.count() == 10002, "no false negatives across the union")

      // OR of two ranges: both disjuncts box-prune, union stays small
      val twoRanges = t.filter(col("k") < 10000L || col("k") >= 150000L)
      assert(scannedFiles(twoRanges) <= 5)
      assert(twoRanges.count() == 20000)

      // one disjunct references an un-indexed column: it can match
      // anywhere, so the whole OR must fall back to the full scan —
      // bail, never a wrong prune
      val bail = t.filter(col("k").between(20000L, 29999L) ||
        col("v") === 3L)
      assert(scannedFiles(bail) == 16, "unprunable disjunct must not prune")
      val expected = (0L until 160000L).count(id =>
        (id >= 20000L && id <= 29999L) || id % 7 == 3L)
      assert(bail.count() === expected, "bail shape answers exactly")
    } finally {
      SkipRewrite.unregister(s"$dir/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("explainAcceleration reports per-scan verdicts on a self-join " +
      "(one side pruned, one full — never blended)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skipsj").toString
    try {
      spark.range(80000)
        .select(col("id").as("k"), (col("id") % 5).as("v"))
        .repartitionByRange(8, col("k")).write.parquet(s"$dir/t")
      Layout.statsIndex(spark, s"$dir/t", Seq("k"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      SkipRewrite.register(spark, s"$dir/t", s"$dir/idx")
      // first scan: a tight range on the indexed key — prunes; second
      // scan: an equality on the UN-indexed column — bails to the full
      // scan. (A join would let constraint propagation infer the range
      // onto the other side — a union keeps the two scans independent.)
      val pruned = spark.read.parquet(s"$dir/t")
        .filter(col("k").between(100L, 199L))
      val full = spark.read.parquet(s"$dir/t")
        .filter(col("v") === 3L)
      val j = pruned.unionByName(full)
      assert(j.count() == 100 + 16000)
      val report = graft.plans.Acceleration.explainAcceleration(j)
      assert(report.contains("2 scans of this base"),
        s"expected per-scan verdicts, got:\n$report")
      assert(report.contains("1 PRUNED") && report.contains("1 NOT PRUNED"),
        s"expected one pruned + one full verdict, got:\n$report")
      // single-scan shape unchanged: the round-10 verdict strings
      val single = spark.read.parquet(s"$dir/t")
        .filter(col("k").between(100L, 199L))
      assert(graft.plans.Acceleration.explainAcceleration(single)
        .contains("PRUNED — scan rewritten to"))
    } finally {
      SkipRewrite.unregister(s"$dir/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("explainAcceleration distinguishes index-emptied scans from scans " +
      "the optimizer removed for its own reasons") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skipelim").toString
    try {
      spark.range(50000)
        .select(col("id").as("k"), (col("id") % 5).as("v"))
        .repartitionByRange(4, col("k")).write.parquet(s"$dir/t")
      Layout.statsIndex(spark, s"$dir/t", Seq("k"))
        .write.mode("overwrite").parquet(s"$dir/idx")
      SkipRewrite.register(spark, s"$dir/t", s"$dir/idx")
      // the INDEX empties this one: k outside every file's [min, max]
      val emptied = spark.read.parquet(s"$dir/t")
        .filter(col("k") === 999999999L)
      assert(emptied.count() == 0)
      assert(graft.plans.Acceleration.explainAcceleration(emptied)
        .contains("PRUNED — scan rewritten to the empty relation"))
      // the OPTIMIZER removes this one (constant-false folding) — the
      // rule never touched it, and the report must not claim it did
      val folded = spark.read.parquet(s"$dir/t").filter(lit(1) === lit(2))
      assert(folded.count() == 0)
      val report = graft.plans.Acceleration.explainAcceleration(folded)
      assert(report.contains("SCAN ELIMINATED by the optimizer"),
        s"a constant-false fold must not be reported as index work:\n$report")
      // multi-scan: one of each, counted separately
      val mixed = spark.read.parquet(s"$dir/t")
        .filter(col("k") === 999999999L)
        .unionByName(spark.read.parquet(s"$dir/t").filter(lit(1) === lit(2)))
      assert(mixed.count() == 0)
      val mixedReport = graft.plans.Acceleration.explainAcceleration(mixed)
      assert(mixedReport.contains("1 pruned to empty") &&
        mixedReport.contains("1 eliminated by the optimizer"),
        s"expected one emptied + one eliminated verdict, got:\n$mixedReport")
    } finally {
      SkipRewrite.unregister(s"$dir/t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
