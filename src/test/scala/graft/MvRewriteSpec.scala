package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Cdc
import graft.plans.MvRewrite

/** Aggregate navigation: ad-hoc aggregates over a registered base table
  * must be answered from the maintained snapshot (petabyte scan →
  * kilobyte scan), invisibly and only when the snapshot can answer
  * EXACTLY. l_quantity is integral, so fixed-point cents arithmetic
  * reproduces the double sums bit-for-bit and equality checks are
  * exact. */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val basePath = s"${TestSession.sf0001}/lineitem.parquet"
  private val keys = Seq("l_returnflag", "l_linestatus")

  private def withSnapshot(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv").toString
    try {
      val base = spark.read.parquet(basePath)
      Cdc.aggSnapshot(base, keys, Seq("l_quantity"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap")
      f(s"$dir/snap")
    } finally {
      MvRewrite.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  private def scansOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("exact-key aggregate is answered from the snapshot, results identical") {
    withSnapshot { snapPath =>
      val q = spark.read.parquet(basePath)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"),
          avg("l_quantity").as("a"))
      val plan = scansOf(q)
      assert(plan.contains(snapPath), s"snapshot not scanned:\n$plan")
      assert(!plan.contains("lineitem.parquet"), s"base still scanned:\n$plan")
      // unregister -> the same query scans the base again
      MvRewrite.unregister(basePath)
      val direct = spark.read.parquet(basePath)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"),
          avg("l_quantity").as("a"))
      assert(scansOf(direct).contains("lineitem.parquet"))
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      val got = q.orderBy("l_returnflag", "l_linestatus")
        .as[(String, String, Long, Double, Double)].collect().toSeq
      val want = direct.orderBy("l_returnflag", "l_linestatus")
        .as[(String, String, Long, Double, Double)].collect().toSeq
      assert(got == want, s"rewritten answer diverged:\n$got\nvs\n$want")
    }
  }

  test("coarser grouping re-aggregates the snapshot (navigation), still exact") {
    withSnapshot { snapPath =>
      val q = spark.read.parquet(basePath)
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      assert(scansOf(q).contains(snapPath))
      MvRewrite.unregister(basePath)
      val want = spark.read.parquet(basePath)
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
        .orderBy("l_returnflag").as[(String, Double, Long)].collect().toSeq
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      val got = q.orderBy("l_returnflag").as[(String, Double, Long)].collect().toSeq
      assert(got == want)
      // global (no grouping) navigates too
      val tot = spark.read.parquet(basePath).agg(sum("l_quantity").as("s"))
      assert(scansOf(tot).contains(snapPath))
      MvRewrite.unregister(basePath)
      val totWant = spark.read.parquet(basePath).agg(sum("l_quantity").as("s"))
        .as[Double].collect().head
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      assert(tot.as[Double].collect().head == totWant)
    }
  }

  test("key-only filters are replayed against the snapshot (filtered navigation)") {
    withSnapshot { snapPath =>
      val q = spark.read.parquet(basePath)
        .filter(col("l_returnflag") === "A" && col("l_linestatus") =!= "Z")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
      val plan = scansOf(q)
      assert(plan.contains(snapPath) && !plan.contains("lineitem.parquet"),
        s"key-filtered aggregate not navigated:\n$plan")
      MvRewrite.unregister(basePath)
      val want = spark.read.parquet(basePath)
        .filter(col("l_returnflag") === "A" && col("l_linestatus") =!= "Z")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
        .orderBy("l_linestatus").as[(String, Long, Double)].collect().toSeq
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      val got = q.orderBy("l_linestatus").as[(String, Long, Double)].collect().toSeq
      assert(got == want)
    }
  }

  test("derived-measure navigation: sum(price * (1 - discount)) served from the snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-drv").toString
    try {
      val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val base = spark.read.parquet(basePath)
      // snapshot carries the derived column, computed ONCE at build time
      graft.ops.Cdc.aggSnapshot(base.withColumn("revenue", revenue),
          keys, Seq("revenue"), scale = 4)
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.registerDerived(spark, basePath, keys, Seq.empty,
        Map("revenue" -> revenue), s"$dir/snap", scale = 4)
      try {
        // the query writes the formula out longhand — the tpch_q1 shape
        val q = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        val plan = scansOf(q)
        assert(plan.contains(s"$dir/snap") && !plan.contains("lineitem.parquet"),
          s"derived measure not navigated:\n$plan")
        MvRewrite.unregister(basePath)
        val want = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .orderBy("l_returnflag")
          .as[(String, Double)].collect().toSeq
        MvRewrite.registerDerived(spark, basePath, keys, Seq.empty,
          Map("revenue" -> revenue), s"$dir/snap", scale = 4)
        val got = q.orderBy("l_returnflag").as[(String, Double)].collect().toSeq
        // prices carry 2 decimals and discounts 2 more -> scale=4 is
        // exact, but the double SUM of ~15k products is order-sensitive
        // in its last ulps; the snapshot's fixed-point total is the
        // order-independent answer, so compare to 6 significant digits
        // (the harness's own canonicalization)
        got.zip(want).foreach { case ((ka, va), (kb, vb)) =>
          assert(ka == kb && math.abs(va - vb) / math.abs(vb) < 1e-9,
            s"derived answer diverged: ($ka,$va) vs ($kb,$vb)")
        }
        // a DIFFERENT formula must not match the registered one
        val other = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(sum(col("l_extendedprice") * (lit(1) + col("l_discount"))).as("rev"))
        assert(scansOf(other).contains("lineitem.parquet"),
          "sign-flipped formula wrongly matched the derived measure")
      } finally MvRewrite.unregister(basePath)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("min/max navigate for append-only-registered measures") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-mm").toString
    try {
      Cdc.aggSnapshotMinMax(spark.read.parquet(basePath), keys, Seq("l_quantity"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap",
        minMaxMeasures = Seq("l_quantity"))
      try {
        val q = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(min("l_quantity").as("mn"), max("l_quantity").as("mx"),
            sum("l_quantity").as("s"), count(lit(1)).as("n"))
        val plan = scansOf(q)
        assert(plan.contains(s"$dir/snap") && !plan.contains("lineitem.parquet"),
          s"min/max aggregate not navigated:\n$plan")
        MvRewrite.unregister(basePath)
        val want = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(min("l_quantity").as("mn"), max("l_quantity").as("mx"),
            sum("l_quantity").as("s"), count(lit(1)).as("n"))
          .orderBy("l_returnflag")
          .as[(String, Double, Double, Double, Long)].collect().toSeq
        MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap",
          minMaxMeasures = Seq("l_quantity"))
        val got = q.orderBy("l_returnflag")
          .as[(String, Double, Double, Double, Long)].collect().toSeq
        assert(got == want)
      } finally MvRewrite.unregister(basePath)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("distinct-count navigation: kmv_distinct served from snapshot sketches, IDENTICAL answer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-kmv").toString
    try {
      Cdc.aggSnapshotMinMax(spark.read.parquet(basePath), keys, Seq("l_quantity"),
          distinctCols = Seq("l_partkey"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap",
        minMaxMeasures = Seq("l_quantity"), distinctCols = Seq("l_partkey"))
      try {
        // coarser grouping: per-key sketches MERGE, then estimate — the
        // KMV order statistic makes navigated == direct, bit for bit
        def q() = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(expr("kmv_distinct(l_partkey)").as("d"), count(lit(1)).as("n"))
        val plan = scansOf(q())
        assert(plan.contains(s"$dir/snap") && !plan.contains("lineitem.parquet"),
          s"kmv_distinct not navigated:\n$plan")
        val got = q().orderBy("l_returnflag").as[(String, Long, Long)].collect().toSeq
        MvRewrite.unregister(basePath)
        val want = q().orderBy("l_returnflag").as[(String, Long, Long)].collect().toSeq
        assert(got == want, s"navigated kmv diverged from direct:\n$got\nvs\n$want")
        MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap",
          minMaxMeasures = Seq("l_quantity"), distinctCols = Seq("l_partkey"))
        // approx_count_distinct carries a PRECISION contract (its rsd):
        // a k=64 sketch (~12.7% std err) must NOT serve the default 5%
        // request...
        def acd() = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(approx_count_distinct("l_partkey").as("d"))
        assert(scansOf(acd()).contains("lineitem.parquet"),
          "k=64 sketches wrongly served a 5%-rsd approx_count_distinct")
        // ...but a k=512 registration (std err ~4.4%) does navigate —
        // the documented HLL++ -> KMV estimator swap, within band
        MvRewrite.unregister(basePath)
        Cdc.aggSnapshotMinMax(spark.read.parquet(basePath), keys, Seq("l_quantity"),
            distinctCols = Seq("l_partkey"), kmvK = 512)
          .write.mode("overwrite").parquet(s"$dir/snap512")
        MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap512",
          minMaxMeasures = Seq("l_quantity"), distinctCols = Seq("l_partkey"),
          kmvK = 512)
        val planA = scansOf(acd())
        assert(planA.contains(s"$dir/snap512") && !planA.contains("lineitem.parquet"),
          s"approx_count_distinct not navigated at sufficient k:\n$planA")
        MvRewrite.unregister(basePath)
        val exact = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(countDistinct("l_partkey").cast("double").as("d"))
          .orderBy("l_returnflag").as[(String, Double)].collect().toMap
        MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap512",
          minMaxMeasures = Seq("l_quantity"), distinctCols = Seq("l_partkey"),
          kmvK = 512)
        acd().orderBy("l_returnflag").as[(String, Long)].collect().foreach {
          case (k, est) =>
            assert(math.abs(est - exact(k)) / exact(k) < 0.14,
              s"navigated approx estimate $est too far from exact ${exact(k)} for $k")
        }
        // restore the k=64 registration for the remaining negatives
        MvRewrite.unregister(basePath)
        MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap",
          minMaxMeasures = Seq("l_quantity"), distinctCols = Seq("l_partkey"))
        // key-only filters compose with distinct navigation: the
        // predicate replays against the snapshot's key column and the
        // surviving groups' sketches merge — answer still identical
        def qf() = spark.read.parquet(basePath)
          .filter(col("l_linestatus") === "F")
          .groupBy("l_returnflag")
          .agg(expr("kmv_distinct(l_partkey)").as("d"))
        val planF = scansOf(qf())
        assert(planF.contains(s"$dir/snap") && !planF.contains("lineitem.parquet"),
          s"key-filtered kmv_distinct not navigated:\n$planF")
        val gotF = qf().orderBy("l_returnflag").as[(String, Long)].collect().toSeq
        MvRewrite.unregister(basePath)
        val wantF = qf().orderBy("l_returnflag").as[(String, Long)].collect().toSeq
        MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap",
          minMaxMeasures = Seq("l_quantity"), distinctCols = Seq("l_partkey"))
        assert(gotF == wantF, s"filtered kmv diverged:\n$gotF\nvs\n$wantF")
        // a NON-registered column's distinct count is left untouched
        val other = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(expr("kmv_distinct(l_suppkey)").as("d"))
        assert(scansOf(other).contains("lineitem.parquet"),
          "kmv_distinct over unregistered column wrongly navigated")
        // and a mismatched k cannot use the stored sketches
        val otherK = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(expr("kmv_distinct(l_partkey, 128)").as("d"))
        assert(scansOf(otherK).contains("lineitem.parquet"),
          "kmv_distinct with mismatched k wrongly navigated")
      } finally MvRewrite.unregister(basePath)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("NULL-bearing measures: rewritten count(m)/sum(m)/avg(m) match the base exactly") {
    // avg(m) must divide by the NON-NULL count (Spark's Average skips
    // NULLs; dividing by count(*) silently underestimates), and sum(m)
    // over an all-NULL group must come back NULL, not 0 — the round-5
    // ADVICE high item, now carried by the snapshot's cnt_<m> columns.
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-null").toString
    try {
      Seq[(String, java.lang.Double)](
        ("a", 1.5), ("a", null), ("a", 2.5), ("b", null), ("b", null),
        ("c", 4.0), ("c", 6.0))
        .toDF("k", "v").write.mode("overwrite").parquet(s"$dir/base")
      Cdc.aggSnapshot(spark.read.parquet(s"$dir/base"), Seq("k"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.register(spark, s"$dir/base", Seq("k"), Seq("v"), s"$dir/snap")
      try {
        def q() = spark.read.parquet(s"$dir/base")
          .groupBy("k")
          .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
            sum("v").as("s"), avg("v").as("a"))
        val plan = scansOf(q())
        assert(plan.contains(s"$dir/snap") && !plan.contains(s"$dir/base"),
          s"null-measure aggregate not navigated:\n$plan")
        val got = q().orderBy("k")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            Option(r.get(3)), Option(r.get(4)))).toSeq
        MvRewrite.unregister(s"$dir/base")
        val want = q().orderBy("k")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            Option(r.get(3)), Option(r.get(4)))).toSeq
        assert(got == want, s"null semantics diverged:\n$got\nvs\n$want")
        // and concretely: b's sum/avg are NULL, a's avg divides by 2 not 3
        assert(want.find(_._1 == "b").get._4.isEmpty)
        assert(want.find(_._1 == "a").get._5.contains(2.0))
      } finally MvRewrite.unregister(s"$dir/base")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("shape bails are observable: recentBails names the view and the reason") {
    withSnapshot { snapPath =>
      // a known-bail shape: a filter over a NON-key column — the view
      // matches the scanned base but cannot answer, and that decision
      // must be greppable without re-running anything
      val before = MvRewrite.recentBails.size
      val q = spark.read.parquet(basePath)
        .filter(col("l_discount") > 0.05)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      val plan = scansOf(q)
      assert(!plan.contains(snapPath), s"non-key filter must not navigate:\n$plan")
      val bails = MvRewrite.recentBails.drop(before)
      assert(bails.exists(l => l.contains(basePath) &&
          l.contains("l_discount")),
        s"expected a bail line naming the view and l_discount, got:\n" +
          bails.mkString("\n"))
      // an unregistered-measure bail carries its own reason
      val before2 = MvRewrite.recentBails.size
      val q2 = spark.read.parquet(basePath)
        .groupBy("l_returnflag").agg(sum("l_extendedprice").as("s"))
      assert(!scansOf(q2).contains(snapPath))
      assert(MvRewrite.recentBails.drop(before2)
          .exists(_.contains("not a registered measure")),
        "expected an unregistered-measure bail line")
      // navigated queries add nothing
      val before3 = MvRewrite.recentBails.size
      val ok = spark.read.parquet(basePath)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(scansOf(ok).contains(snapPath))
      assert(MvRewrite.recentBails.size == before3,
        "a navigated query must not record a bail")
    }
  }

  test("register rejects non-floating measures; overlapping registrations are refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-guard").toString
    try {
      Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$dir/base")
      // LONG measure: the rewrite would silently retype the sum to DOUBLE
      val e = intercept[IllegalArgumentException](
        MvRewrite.register(spark, s"$dir/base", Seq("v"), Seq("id"), s"$dir/snap"))
      assert(e.getMessage.contains("only double/float"))
      // overlap guard: a second registration sharing roots is refused
      MvRewrite.register(spark, s"$dir/base", Seq("id"), Seq("v"), s"$dir/snap")
      try {
        val e2 = intercept[IllegalArgumentException](
          MvRewrite.register(spark, s"$dir/base/", Seq("id"), Seq("v"), s"$dir/snap2"))
        assert(e2.getMessage.contains("overlaps"))
        // same basePath re-registers fine (the refresh idiom)
        MvRewrite.register(spark, s"$dir/base", Seq("id"), Seq("v"), s"$dir/snap")
      } finally MvRewrite.unregister(s"$dir/base")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("a partition-subdirectory scan of a registered base does NOT rewrite") {
    // lookup matches EXACT root-path sets: reading one partition
    // subdirectory must scan that subdirectory, never the whole-table
    // snapshot (which would return totals for partitions the user
    // explicitly excluded).
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-subdir").toString
    try {
      Seq(("a", "p1", 1.0), ("a", "p2", 2.0), ("b", "p1", 3.0))
        .toDF("k", "p", "v")
        .write.mode("overwrite").partitionBy("p").parquet(s"$dir/base")
      Cdc.aggSnapshot(spark.read.parquet(s"$dir/base"), Seq("k"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.register(spark, s"$dir/base", Seq("k"), Seq("v"), s"$dir/snap")
      try {
        val sub = spark.read.parquet(s"$dir/base/p=p1")
          .groupBy("k").agg(sum("v").as("s"))
        val plan = scansOf(sub)
        assert(!plan.contains(s"$dir/snap"),
          s"subdirectory scan wrongly rewritten to whole-table snapshot:\n$plan")
        val got = sub.orderBy("k").as[(String, Double)].collect().toSeq
        assert(got == Seq(("a", 1.0), ("b", 3.0)))
      } finally MvRewrite.unregister(s"$dir/base")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("time-bucketed derived key: groupBy(date_trunc) navigates a day-keyed snapshot") {
    // the commonest dashboard rollup — GROUP BY date_trunc('day', ts) —
    // must be answerable even though "day" is not a base column: the
    // snapshot materializes the bucket as a key column and registration
    // records the bucket FORMULA, matched semantically like derived
    // measures (round-6 VERDICT next-round #2).
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-bucket").toString
    try {
      val ts0 = java.sql.Timestamp.valueOf("2024-03-01 00:10:00")
      val rows = (0 until 500).map { i =>
        (new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000),
          if (i % 3 == 0) "eu" else "us", (i % 17).toDouble)
      }
      rows.toDF("ts", "r", "v").write.mode("overwrite").parquet(s"$dir/base")
      val bucket = date_trunc("day", col("ts"))
      Cdc.aggSnapshot(
          spark.read.parquet(s"$dir/base").withColumn("day", bucket),
          Seq("day", "r"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.registerDerived(spark, s"$dir/base", Seq("day", "r"), Seq("v"),
        Map.empty, s"$dir/snap", derivedKeys = Map("day" -> bucket))
      try {
        def q() = spark.read.parquet(s"$dir/base")
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n"), sum("v").as("s"))
        val plan = scansOf(q())
        assert(plan.contains(s"$dir/snap") && !plan.contains(s"$dir/base"),
          s"date_trunc grouping not navigated:\n$plan")
        val got = q().orderBy("day")
          .as[(java.sql.Timestamp, Long, Double)].collect().toSeq
        MvRewrite.unregister(s"$dir/base")
        val want = q().orderBy("day")
          .as[(java.sql.Timestamp, Long, Double)].collect().toSeq
        assert(got == want, s"bucketed answer diverged:\n$got\nvs\n$want")
        MvRewrite.registerDerived(spark, s"$dir/base", Seq("day", "r"), Seq("v"),
          Map.empty, s"$dir/snap", derivedKeys = Map("day" -> bucket))
        // mixing the bucket with a plain key navigates too
        val mixed = spark.read.parquet(s"$dir/base")
          .groupBy(date_trunc("day", col("ts")).as("day"), col("r"))
          .agg(sum("v").as("s"))
        assert(scansOf(mixed).contains(s"$dir/snap"),
          s"bucket+plain-key grouping not navigated:\n${scansOf(mixed)}")
        // a COARSER bucket width is served through the rollup hierarchy
        // (month boundaries are day boundaries — round 8); value
        // exactness is swept in the dedicated hierarchy test. A FINER
        // width must still bail.
        val monthly = spark.read.parquet(s"$dir/base")
          .groupBy(date_trunc("month", col("ts")).as("mon"))
          .agg(sum("v").as("s"))
        assert(scansOf(monthly).contains(s"$dir/snap"),
          "month bucket should roll up from the day-keyed registration")
        val hourly = spark.read.parquet(s"$dir/base")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(sum("v").as("s"))
        assert(scansOf(hourly).contains(s"$dir/base"),
          "hour bucket wrongly matched the day-keyed registration")
        // count(DISTINCT bucket) — "days present per region" — matches
        // the derived key by formula and reads the snapshot exactly
        def days() = spark.read.parquet(s"$dir/base")
          .groupBy("r")
          .agg(countDistinct(date_trunc("day", col("ts"))).as("days"))
        assert(scansOf(days()).contains(s"$dir/snap"),
          s"count(DISTINCT bucket) not navigated:\n${scansOf(days())}")
        val gotD = days().orderBy("r").as[(String, Long)].collect().toSeq
        MvRewrite.unregister(s"$dir/base")
        val wantD = days().orderBy("r").as[(String, Long)].collect().toSeq
        assert(gotD == wantD, s"days-present diverged:\n$gotD\nvs\n$wantD")
        MvRewrite.registerDerived(spark, s"$dir/base", Seq("day", "r"), Seq("v"),
          Map.empty, s"$dir/snap", derivedKeys = Map("day" -> bucket))
      } finally MvRewrite.unregister(s"$dir/base")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("trunc hierarchy requires matching time zones: a tz-switched session bails, never mis-buckets") {
    // month boundaries in one zone are NOT day boundaries in another —
    // a coarser-trunc match across a session-tz change would silently
    // mis-bucket every boundary-straddling row (round-8 ADVICE). The
    // zone guard must bail BOTH the coarser rollup and (via
    // semanticEquals) the exact-format match.
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-tz").toString
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "UTC")
      val ts0 = java.sql.Timestamp.valueOf("2024-03-30 20:00:00")
      (0 until 200).map { i =>
        (new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000), (i % 5).toDouble)
      }.toDF("ts", "v").write.mode("overwrite").parquet(s"$dir/base")
      val bucket = date_trunc("day", col("ts"))
      Cdc.aggSnapshot(
          spark.read.parquet(s"$dir/base").withColumn("day", bucket),
          Seq("day"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.registerDerived(spark, s"$dir/base", Seq("day"), Seq("v"),
        Map.empty, s"$dir/snap", derivedKeys = Map("day" -> bucket))
      def monthly() = spark.read.parquet(s"$dir/base")
        .groupBy(date_trunc("month", col("ts")).as("mon"))
        .agg(sum("v").as("s"))
      assert(scansOf(monthly()).contains(s"$dir/snap"),
        "same-zone month rollup must navigate the day-keyed registration")
      // the session moves to a +05:30 zone: its month boundaries don't
      // align with the UTC day buckets — navigation must bail to the
      // base (correct answers, just not navigated)
      spark.conf.set(tzKey, "Asia/Kolkata")
      val crossPlan = scansOf(monthly())
      assert(crossPlan.contains(s"$dir/base") && !crossPlan.contains(s"$dir/snap"),
        s"tz-mismatched month rollup wrongly navigated:\n$crossPlan")
      // the exact day-format query bails the same way (different tz =
      // different formula under semanticEquals)
      val daily = spark.read.parquet(s"$dir/base")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum("v").as("s"))
      assert(scansOf(daily).contains(s"$dir/base"),
        "tz-mismatched day grouping wrongly navigated")
      // and the bail is observable with the zone mismatch's shape reason
      assert(MvRewrite.recentBails.exists(l => l.contains(s"$dir/base")),
        "expected a recorded bail for the tz-switched query")
      // back in the registration zone, navigation resumes
      spark.conf.set(tzKey, "UTC")
      assert(scansOf(monthly()).contains(s"$dir/snap"),
        "restoring the session tz must restore navigation")
    } finally {
      spark.conf.set(tzKey, saved)
      MvRewrite.unregister(s"$dir/base")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("time-range filters over derived bucket keys navigate (sweep) and mixed terms bail") {
    // WHERE date_trunc('day', ts) BETWEEN a AND b GROUP BY the same
    // bucket — every dashboard's shape. The bucket formula is constant
    // within each day-group, so a predicate over it selects WHOLE
    // groups and replays on the snapshot's bucket column. Swept:
    // filter kind x grouping x aggregate, every combo value-exact.
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-bfilter").toString
    try {
      val ts0 = java.sql.Timestamp.valueOf("2024-03-01 00:10:00")
      val rows = (0 until 500).map { i =>
        (new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000),
          if (i % 3 == 0) "eu" else "us", (i % 17).toDouble)
      }
      rows.toDF("ts", "r", "v").write.mode("overwrite").parquet(s"$dir/base")
      val bucket = date_trunc("day", col("ts"))
      Cdc.aggSnapshot(
          spark.read.parquet(s"$dir/base").withColumn("day", bucket),
          Seq("day", "r"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      def reg() = MvRewrite.registerDerived(spark, s"$dir/base", Seq("day", "r"),
        Seq("v"), Map.empty, s"$dir/snap", derivedKeys = Map("day" -> bucket))
      reg()
      try {
        val lo = "2024-03-05"; val hi = "2024-03-12"
        val filters: Seq[(String, org.apache.spark.sql.Column)] = Seq(
          "range" -> date_trunc("day", col("ts")).between(lo, hi),
          "eq" -> (date_trunc("day", col("ts")) === s"$lo 00:00:00"),
          "range+plain" ->
            (date_trunc("day", col("ts")) >= lo && col("r") === "us"),
          "ineq" -> (date_trunc("day", col("ts")) < hi))
        val groupings: Seq[(String, Seq[org.apache.spark.sql.Column])] = Seq(
          "bucket" -> Seq(date_trunc("day", col("ts")).as("day")),
          "bucket+key" -> Seq(date_trunc("day", col("ts")).as("day"), col("r")),
          "key" -> Seq(col("r")),
          "none" -> Nil)
        val aggs: Seq[(String, org.apache.spark.sql.Column)] = Seq(
          "cnt" -> count(lit(1)), "s" -> sum("v"), "a" -> avg("v"))
        var navigated = 0
        for { (fn, f) <- filters; (gn, g) <- groupings; (an, ac) <- aggs } {
          def q() = {
            val base = spark.read.parquet(s"$dir/base").filter(f)
            val grouped = if (g.isEmpty) base.groupBy() else base.groupBy(g: _*)
            grouped.agg(ac.as("x"))
          }
          val plan = scansOf(q())
          val hit = plan.contains(s"$dir/snap") && !plan.contains(s"$dir/base")
          if (hit) navigated += 1
          val got = q().collect().map(_.toString).sorted.toSeq
          MvRewrite.unregister(s"$dir/base")
          val want = q().collect().map(_.toString).sorted.toSeq
          reg()
          assert(got == want,
            s"combo filter=$fn group=$gn agg=$an (navigated=$hit) diverged:\n$got\nvs\n$want")
        }
        assert(navigated == filters.size * groupings.size * aggs.size,
          s"only $navigated bucket-filtered combos navigated")
        // NEGATIVE: a predicate mixing the bucket formula and the RAW
        // timestamp selects partial groups — must stay on the base
        val mixed = spark.read.parquet(s"$dir/base")
          .filter(date_trunc("day", col("ts")) >= lo &&
            col("ts") < s"$hi 06:00:00")
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(sum("v").as("s"))
        assert(scansOf(mixed).contains(s"$dir/base"),
          "mixed bucket+raw-timestamp filter wrongly navigated")
        // NEGATIVE: a raw-timestamp-only filter
        val raw = spark.read.parquet(s"$dir/base")
          .filter(col("ts") >= lo)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(sum("v").as("s"))
        assert(scansOf(raw).contains(s"$dir/base"),
          "raw-timestamp filter wrongly navigated")
        // a COARSER bucket width in the filter navigates through the
        // rollup hierarchy (round 8) — value-exact
        def coarserF() = spark.read.parquet(s"$dir/base")
          .filter(date_trunc("month", col("ts")) === "2024-03-01 00:00:00")
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(sum("v").as("s"))
        assert(scansOf(coarserF()).contains(s"$dir/snap"),
          s"month-width filter should roll up:\n${scansOf(coarserF())}")
        val gotC = coarserF().orderBy("day").collect().map(_.toString).toSeq
        MvRewrite.unregister(s"$dir/base")
        val wantC = coarserF().orderBy("day").collect().map(_.toString).toSeq
        reg()
        assert(gotC == wantC && wantC.nonEmpty, "coarser-filter rollup diverged")
        // NEGATIVE: a FINER bucket width in the filter must still bail
        val finerF = spark.read.parquet(s"$dir/base")
          .filter(date_trunc("hour", col("ts")) === "2024-03-05 03:00:00")
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(sum("v").as("s"))
        assert(scansOf(finerF).contains(s"$dir/base"),
          "hour-width filter wrongly matched the day-keyed registration")
      } finally MvRewrite.unregister(s"$dir/base")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("window() bucket keys: a tumbling-window grouping navigates; mismatched width bails") {
    // the W3 shape as an MV key: GROUP BY window($"ts", "10 minutes").
    // TimeWindowing rewrites the grouping to a Project-aliased struct
    // AND inserts `Filter isnotnull(ts)` below it — on BOTH the
    // snapshot build and the query — so registration records the
    // implied null filter and the rewrite drops that conjunct instead
    // of bailing on the raw-column reference.
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-window").toString
    try {
      val ts0 = java.sql.Timestamp.valueOf("2024-03-01 00:10:00")
      val rows = (0 until 400).map { i =>
        (new java.sql.Timestamp(ts0.getTime + i * 97000L),
          if (i % 3 == 0) "eu" else "us", (i % 13).toDouble)
      }
      rows.toDF("ts", "r", "v").write.mode("overwrite").parquet(s"$dir/base")
      val w = window(col("ts"), "10 minutes")
      Cdc.aggSnapshot(
          spark.read.parquet(s"$dir/base").withColumn("w", w),
          Seq("w", "r"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.registerDerived(spark, s"$dir/base", Seq("w", "r"), Seq("v"),
        Map.empty, s"$dir/snap", derivedKeys = Map("w" -> w))
      try {
        def q() = spark.read.parquet(s"$dir/base")
          .groupBy(window(col("ts"), "10 minutes"), col("r"))
          .agg(count(lit(1)).as("n"), sum("v").as("s"), avg("v").as("a"))
          .select(col("window.start").as("ws"), col("r"),
            col("n"), col("s"), col("a"))
        val plan = scansOf(q())
        assert(plan.contains(s"$dir/snap") && !plan.contains(s"$dir/base"),
          s"window() grouping not navigated:\n$plan")
        val got = q().orderBy("ws", "r").collect().map(_.toString).toSeq
        MvRewrite.unregister(s"$dir/base")
        val want = q().orderBy("ws", "r").collect().map(_.toString).toSeq
        assert(got == want && want.nonEmpty,
          s"window-bucketed answer diverged:\n$got\nvs\n$want")
        MvRewrite.registerDerived(spark, s"$dir/base", Seq("w", "r"), Seq("v"),
          Map.empty, s"$dir/snap", derivedKeys = Map("w" -> w))
        // coarser navigation over the window groups (drop r) works too
        val coarse = spark.read.parquet(s"$dir/base")
          .groupBy(window(col("ts"), "10 minutes"))
          .agg(sum("v").as("s"))
        assert(scansOf(coarse).contains(s"$dir/snap"),
          s"coarser window grouping not navigated:\n${scansOf(coarse)}")
        // NEGATIVE: a mismatched window width must not be served
        val fiveMin = spark.read.parquet(s"$dir/base")
          .groupBy(window(col("ts"), "5 minutes"))
          .agg(sum("v").as("s"))
        assert(scansOf(fiveMin).contains(s"$dir/base"),
          "5-minute window wrongly matched the 10-minute registration")
        // NEGATIVE: a SLIDING window (Expand below the aggregate) bails
        val sliding = spark.read.parquet(s"$dir/base")
          .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
          .agg(sum("v").as("s"))
        assert(scansOf(sliding).contains(s"$dir/base"),
          "sliding window wrongly navigated")
      } finally MvRewrite.unregister(s"$dir/base")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("bucket hierarchy: coarser date_trunc groupings/filters navigate a finer-keyed snapshot") {
    // month(ts) == month(day(ts)) — month/quarter/year boundaries are
    // day boundaries, so a day-keyed snapshot answers every coarser
    // rollup by re-truncating its bucket column. The dashboard drill-
    // up shape: one maintained daily MV serves day, week, month,
    // quarter AND year dashboards.
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-hier").toString
    try {
      val ts0 = java.sql.Timestamp.valueOf("2024-01-05 00:10:00")
      val rows = (0 until 900).map { i =>
        (new java.sql.Timestamp(ts0.getTime + i * 7L * 3600 * 1000),
          if (i % 3 == 0) "eu" else "us", (i % 17).toDouble)
      }
      rows.toDF("ts", "r", "v").write.mode("overwrite").parquet(s"$dir/base")
      val bucket = date_trunc("day", col("ts"))
      Cdc.aggSnapshot(
          spark.read.parquet(s"$dir/base").withColumn("day", bucket),
          Seq("day", "r"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      def reg() = MvRewrite.registerDerived(spark, s"$dir/base", Seq("day", "r"),
        Seq("v"), Map.empty, s"$dir/snap", derivedKeys = Map("day" -> bucket))
      reg()
      try {
        for (coarse <- Seq("week", "month", "quarter", "year")) {
          def q() = spark.read.parquet(s"$dir/base")
            .groupBy(date_trunc(coarse, col("ts")).as("b"), col("r"))
            .agg(count(lit(1)).as("n"), sum("v").as("s"), avg("v").as("a"))
          val plan = scansOf(q())
          assert(plan.contains(s"$dir/snap") && !plan.contains(s"$dir/base"),
            s"$coarse rollup over day-keyed snapshot not navigated:\n$plan")
          val got = q().orderBy("b", "r").collect().map(_.toString).toSeq
          MvRewrite.unregister(s"$dir/base")
          val want = q().orderBy("b", "r").collect().map(_.toString).toSeq
          reg()
          assert(got == want && want.nonEmpty, s"$coarse rollup diverged")
        }
        // a coarser-bucket FILTER navigates too (year range over day key)
        def filtered() = spark.read.parquet(s"$dir/base")
          .filter(date_trunc("month", col("ts")) >= "2024-03-01")
          .groupBy(date_trunc("quarter", col("ts")).as("b"))
          .agg(sum("v").as("s"))
        val fPlan = scansOf(filtered())
        assert(fPlan.contains(s"$dir/snap") && !fPlan.contains(s"$dir/base"),
          s"coarser-bucket filter not navigated:\n$fPlan")
        val gotF = filtered().orderBy("b").collect().map(_.toString).toSeq
        MvRewrite.unregister(s"$dir/base")
        val wantF = filtered().orderBy("b").collect().map(_.toString).toSeq
        reg()
        assert(gotF == wantF && wantF.nonEmpty)
        // count(DISTINCT coarser bucket) — "months present" from days
        def months() = spark.read.parquet(s"$dir/base")
          .groupBy("r")
          .agg(countDistinct(date_trunc("month", col("ts"))).as("months"))
        assert(scansOf(months()).contains(s"$dir/snap"),
          s"count(DISTINCT month) not navigated:\n${scansOf(months())}")
        val gotM = months().orderBy("r").as[(String, Long)].collect().toSeq
        MvRewrite.unregister(s"$dir/base")
        val wantM = months().orderBy("r").as[(String, Long)].collect().toSeq
        reg()
        assert(gotM == wantM)
        // NEGATIVE: a FINER request can never come from a coarser key
        val finer = spark.read.parquet(s"$dir/base")
          .groupBy(date_trunc("hour", col("ts")).as("b"))
          .agg(sum("v").as("s"))
        assert(scansOf(finer).contains(s"$dir/base"),
          "hour grouping wrongly served by a day-keyed snapshot")
      } finally MvRewrite.unregister(s"$dir/base")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("bucket hierarchy negatives: week/month misalignment never navigates") {
    // month-keyed snapshot: week boundaries are NOT month boundaries,
    // so GROUP BY date_trunc('week') must bail even though week is
    // "coarser than day" — nesting is about boundary alignment, not
    // granularity order
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-hier-neg").toString
    try {
      val ts0 = java.sql.Timestamp.valueOf("2024-01-05 00:10:00")
      (0 until 400).map { i =>
        (new java.sql.Timestamp(ts0.getTime + i * 31L * 3600 * 1000), (i % 9).toDouble)
      }.toDF("ts", "v").write.mode("overwrite").parquet(s"$dir/base")
      val bucket = date_trunc("month", col("ts"))
      Cdc.aggSnapshot(
          spark.read.parquet(s"$dir/base").withColumn("mon", bucket),
          Seq("mon"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.registerDerived(spark, s"$dir/base", Seq("mon"), Seq("v"),
        Map.empty, s"$dir/snap", derivedKeys = Map("mon" -> bucket))
      try {
        val weekly = spark.read.parquet(s"$dir/base")
          .groupBy(date_trunc("week", col("ts")).as("b"))
          .agg(sum("v").as("s"))
        assert(scansOf(weekly).contains(s"$dir/base"),
          "week grouping wrongly served by a month-keyed snapshot")
        // but year over month IS aligned and navigates
        val yearly = spark.read.parquet(s"$dir/base")
          .groupBy(date_trunc("year", col("ts")).as("b"))
          .agg(sum("v").as("s"))
        assert(scansOf(yearly).contains(s"$dir/snap"),
          s"year over month-keyed snapshot not navigated:\n${scansOf(yearly)}")
      } finally MvRewrite.unregister(s"$dir/base")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("HAVING composes: a filter above the aggregate keeps referencing the navigated outputs") {
    withSnapshot { snapPath =>
      // DataFrame form: filter on an aggregate output
      def q() = spark.read.parquet(basePath)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
        .filter(col("n") > 100)
      val plan = scansOf(q())
      assert(plan.contains(snapPath) && !plan.contains("lineitem.parquet"),
        s"HAVING-shaped query not navigated:\n$plan")
      val got = q().orderBy("l_returnflag").as[(String, Long, Double)].collect().toSeq
      MvRewrite.unregister(basePath)
      val want = q().orderBy("l_returnflag").as[(String, Long, Double)].collect().toSeq
      assert(got == want && want.nonEmpty)
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      // SQL HAVING over a view of the registered base
      spark.read.parquet(basePath).createOrReplaceTempView("li_mv_having")
      def sqlQ() = spark.sql(
        """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS s
          |FROM li_mv_having GROUP BY l_returnflag
          |HAVING count(*) > 100""".stripMargin)
      val sqlPlan = scansOf(sqlQ())
      assert(sqlPlan.contains(snapPath) && !sqlPlan.contains("lineitem.parquet"),
        s"SQL HAVING not navigated:\n$sqlPlan")
      val gotSql = sqlQ().orderBy("l_returnflag").as[(String, Long, Double)].collect().toSeq
      MvRewrite.unregister(basePath)
      val wantSql = sqlQ().orderBy("l_returnflag").as[(String, Long, Double)].collect().toSeq
      assert(gotSql == wantSql)
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      // a HAVING whose aggregate the snapshot canNOT answer (min of an
      // unregistered measure) leaves the whole query on the base
      val bad = spark.read.parquet(basePath)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), min("l_extendedprice").as("m"))
        .filter(col("m") > 0)
      assert(scansOf(bad).contains("lineitem.parquet"),
        "non-navigable HAVING aggregate wrongly rewritten")
    }
  }

  test("composite distinct: kmv_distinct over a registered tuple navigates, answer identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-tuple").toString
    try {
      Cdc.aggSnapshotMinMax(spark.read.parquet(basePath), keys, Seq("l_quantity"),
          distinctTuples = Seq(Seq("l_partkey", "l_suppkey")))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap",
        distinctTuples = Seq(Seq("l_partkey", "l_suppkey")))
      try {
        def q() = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(call_function("kmv_distinct",
            graft.ops.Sketches.tupleKey(col("l_partkey"), col("l_suppkey"))).as("d"))
        val plan = scansOf(q())
        assert(plan.contains(s"$dir/snap") && !plan.contains("lineitem.parquet"),
          s"tuple kmv_distinct not navigated:\n$plan")
        val got = q().orderBy("l_returnflag").as[(String, Long)].collect().toSeq
        MvRewrite.unregister(basePath)
        val want = q().orderBy("l_returnflag").as[(String, Long)].collect().toSeq
        assert(got == want, s"tuple kmv diverged:\n$got\nvs\n$want")
        MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap",
          distinctTuples = Seq(Seq("l_partkey", "l_suppkey")))
        // a DIFFERENT tuple (reordered columns = different canonical
        // string) must not match the registered sketch
        val other = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(call_function("kmv_distinct",
            graft.ops.Sketches.tupleKey(col("l_suppkey"), col("l_partkey"))).as("d"))
        assert(scansOf(other).contains("lineitem.parquet"),
          "reordered tuple wrongly matched the registered sketch")
      } finally MvRewrite.unregister(basePath)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("quantile navigation: approx_percentile with loose accuracy served from KLL sketches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-kll").toString
    try {
      Cdc.aggSnapshotMinMax(spark.read.parquet(basePath), keys, Seq("l_quantity"),
          kllCols = Seq("l_quantity"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/snap",
        kllCols = Seq("l_quantity"))
      try {
        // k=200 guarantees ~1.65% rank error; accuracy=50 requests 2% —
        // loose enough, so the sketch serves it (estimator swap within
        // the requested band, the approx_count_distinct precedent)
        def q() = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(expr("approx_percentile(l_quantity, 0.5, 50)").as("p50"))
        val plan = scansOf(q())
        assert(plan.contains(s"$dir/snap") && !plan.contains("lineitem.parquet"),
          s"loose approx_percentile not navigated:\n$plan")
        // tolerance gate vs the EXACT percentile: navigated p50's rank
        // must sit within 3x the sketch's rank-error bound (~5% of rows)
        val exact = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(expr("percentile(l_quantity, array(0.40, 0.60))").as("band"))
          .orderBy("l_returnflag")
          .as[(String, Seq[Double])].collect().toMap
        q().orderBy("l_returnflag").as[(String, Double)].collect().foreach {
          case (k, p50) =>
            val Seq(lo, hi) = exact(k)
            assert(p50 >= lo && p50 <= hi,
              s"navigated p50 $p50 for $k outside exact [p40,p60]=[$lo,$hi]")
        }
        // the ARRAY-percentage form (the common dashboard spelling)
        // navigates under the same rank-error guard, returning
        // ARRAY<DOUBLE> like the original
        def qArr() = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(expr("approx_percentile(l_quantity, array(0.25D, 0.5D, 0.75D), 50)")
            .as("ps"))
        val arrPlan = scansOf(qArr())
        assert(arrPlan.contains(s"$dir/snap") && !arrPlan.contains("lineitem.parquet"),
          s"array-percentage approx_percentile not navigated:\n$arrPlan")
        val exactArr = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(expr("percentile(l_quantity, array(0.15, 0.35, 0.40, 0.60, 0.65, 0.85))")
            .as("band")).orderBy("l_returnflag")
          .as[(String, Seq[Double])].collect().toMap
        qArr().orderBy("l_returnflag").as[(String, Seq[Double])].collect().foreach {
          case (k, ps) =>
            assert(ps.length == 3, s"array form returned ${ps.length} values")
            val b = exactArr(k)
            assert(ps(0) >= b(0) && ps(0) <= b(1), s"p25 ${ps(0)} outside [${b(0)},${b(1)}]")
            assert(ps(1) >= b(2) && ps(1) <= b(3), s"p50 ${ps(1)} outside [${b(2)},${b(3)}]")
            assert(ps(2) >= b(4) && ps(2) <= b(5), s"p75 ${ps(2)} outside [${b(4)},${b(5)}]")
        }
        // the DEFAULT accuracy (10000 ≈ 0.01% rank error) is a promise
        // the k=200 sketch cannot keep — must NOT navigate
        val strict = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(expr("approx_percentile(l_quantity, 0.5)").as("p50"))
        assert(scansOf(strict).contains("lineitem.parquet"),
          "default-accuracy approx_percentile wrongly served by a k=200 sketch")
        // array form at strict default accuracy must not navigate either
        val strictArr = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(expr("approx_percentile(l_quantity, array(0.5D, 0.9D))").as("ps"))
        assert(scansOf(strictArr).contains("lineitem.parquet"),
          "default-accuracy array approx_percentile wrongly navigated")
        // an unregistered column bails
        val other = spark.read.parquet(basePath)
          .groupBy("l_returnflag")
          .agg(expr("approx_percentile(l_extendedprice, 0.5, 50)").as("p50"))
        assert(scansOf(other).contains("lineitem.parquet"),
          "approx_percentile over unregistered column wrongly navigated")
      } finally MvRewrite.unregister(basePath)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("count(DISTINCT key) navigates exactly: the snapshot's groups ARE the key combinations") {
    withSnapshot { snapPath =>
      def q() = spark.read.parquet(basePath)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_linestatus").as("d"), count(lit(1)).as("n"))
      val plan = scansOf(q())
      assert(plan.contains(snapPath) && !plan.contains("lineitem.parquet"),
        s"count distinct over a key not navigated:\n$plan")
      val got = q().orderBy("l_returnflag").as[(String, Long, Long)].collect().toSeq
      MvRewrite.unregister(basePath)
      val want = q().orderBy("l_returnflag").as[(String, Long, Long)].collect().toSeq
      assert(got == want, s"navigated count distinct diverged:\n$got\nvs\n$want")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      // the global shape too: distinct (flag, status) pairs = live groups
      val tot = spark.read.parquet(basePath)
        .agg(countDistinct(col("l_returnflag"), col("l_linestatus")).as("d"))
      assert(scansOf(tot).contains(snapPath))
      val gotT = tot.as[Long].collect().head
      MvRewrite.unregister(basePath)
      val wantT = spark.read.parquet(basePath)
        .agg(countDistinct(col("l_returnflag"), col("l_linestatus")).as("d"))
        .as[Long].collect().head
      assert(gotT == wantT)
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      // a NON-key distinct count stays on the base (not answerable)
      val bad = spark.read.parquet(basePath)
        .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("d"))
      assert(scansOf(bad).contains("lineitem.parquet"),
        "non-key count distinct wrongly navigated")
    }
  }

  test("multiple views per base: each grouping navigates to its own snapshot, coarsest wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-multi").toString
    try {
      val base = spark.read.parquet(basePath)
      // view 1: (flag, status)-keyed; view 2: flag-only (coarser)
      Cdc.aggSnapshot(base, keys, Seq("l_quantity"))
        .write.mode("overwrite").parquet(s"$dir/fs")
      Cdc.aggSnapshot(base, Seq("l_returnflag"), Seq("l_quantity"))
        .write.mode("overwrite").parquet(s"$dir/f")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/fs")
      MvRewrite.register(spark, basePath, Seq("l_returnflag"), Seq("l_quantity"),
        s"$dir/f")
      try {
        // fine-grained grouping: only the (flag, status) view can answer
        val fine = spark.read.parquet(basePath)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("s"))
        val pFine = scansOf(fine)
        assert(pFine.contains(s"$dir/fs") && !pFine.contains("lineitem.parquet"),
          s"fine grouping not served by the (flag,status) view:\n$pFine")
        // flag-only grouping: BOTH views can answer; the coarser (and
        // smaller) flag view must win
        val coarse = spark.read.parquet(basePath)
          .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
        val pCoarse = scansOf(coarse)
        assert(pCoarse.contains(s"$dir/f") && !pCoarse.contains(s"$dir/fs"),
          s"coarse grouping not served by the smaller view:\n$pCoarse")
        // answers stay exact through view selection
        val got = coarse.orderBy("l_returnflag").as[(String, Double)].collect().toSeq
        MvRewrite.unregister(basePath)
        val want = spark.read.parquet(basePath)
          .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
          .orderBy("l_returnflag").as[(String, Double)].collect().toSeq
        assert(got == want)
        // re-register only the fine view: the coarse query re-aggregates it
        MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/fs")
        val pAfter = scansOf(spark.read.parquet(basePath)
          .groupBy("l_returnflag").agg(sum("l_quantity").as("s")))
        assert(pAfter.contains(s"$dir/fs"),
          s"after dropping the flag view, the (flag,status) view should serve:\n$pAfter")
        // introspection reflects the registry
        assert(MvRewrite.registered == Seq((basePath, keys)),
          s"registered() wrong: ${MvRewrite.registered}")
      } finally MvRewrite.unregister(basePath)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("exhaustive combination sweep: every navigable grouping x aggregate x filter is value-exact") {
    // the matrix the individual tests sample from, swept whole: for an
    // append-only registration (min/max + distinct sketches available),
    // every combination of grouping subset, aggregate menu, and key
    // filter must either navigate with EXACTLY the direct values or
    // leave the plan alone — never navigate wrong.
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-sweep").toString
    try {
      Cdc.aggSnapshotMinMax(spark.read.parquet(basePath), keys, Seq("l_quantity"),
          distinctCols = Seq("l_partkey"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      def reg() = MvRewrite.register(spark, basePath, keys, Seq("l_quantity"),
        s"$dir/snap", minMaxMeasures = Seq("l_quantity"),
        distinctCols = Seq("l_partkey"))
      reg()
      try {
        val groupings: Seq[Seq[String]] =
          Seq(Nil, Seq("l_returnflag"), Seq("l_linestatus"), keys)
        val aggs: Seq[(String, org.apache.spark.sql.Column)] = Seq(
          "cnt" -> count(lit(1)),
          "s" -> sum("l_quantity"),
          "a" -> avg("l_quantity"),
          "mn" -> min("l_quantity"),
          "mx" -> max("l_quantity"),
          "cm" -> count(col("l_quantity")),
          "cd" -> countDistinct("l_linestatus"),
          "kd" -> expr("kmv_distinct(l_partkey)"),
          // key-predicate FILTER clauses (round 8): replay inside the
          // rewritten aggregate — swept against every grouping x filter
          "cntf" -> expr("count(*) FILTER (WHERE l_linestatus = 'O')"),
          "sf" -> expr("sum(l_quantity) FILTER (WHERE l_returnflag <> 'A')"),
          "mnf" -> expr("min(l_quantity) FILTER (WHERE l_linestatus = 'F')"),
          "kdf" -> expr("kmv_distinct(l_partkey) FILTER (WHERE l_returnflag = 'N')"))
        val filters: Seq[Option[org.apache.spark.sql.Column]] =
          Seq(None, Some(col("l_returnflag") === "A"),
            Some(col("l_linestatus") =!= "F"))
        var navigated = 0
        for {
          g <- groupings
          f <- filters
          (an, ac) <- aggs
        } {
          def q() = {
            val base0 = spark.read.parquet(basePath)
            val base = f.map(base0.filter).getOrElse(base0)
            val grouped = if (g.isEmpty) base.groupBy()
              else base.groupBy(g.map(col): _*)
            val sortCols = g :+ "x"
            grouped.agg(ac.as("x")).orderBy(sortCols.map(col): _*)
          }
          val plan = scansOf(q())
          val hit = plan.contains(s"$dir/snap")
          if (hit) navigated += 1
          val got = q().collect().map(_.toString).toSeq
          MvRewrite.unregister(basePath)
          val want = q().collect().map(_.toString).toSeq
          reg()
          assert(got == want,
            s"combo group=$g filter=${f.isDefined} agg=$an (navigated=$hit) diverged:\n$got\nvs\n$want")
        }
        // every one of these combos is navigable by design — the sweep
        // must not silently degrade to direct scans
        assert(navigated == groupings.size * filters.size * aggs.size,
          s"only $navigated combos navigated")
      } finally MvRewrite.unregister(basePath)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("star rollup: fact ⋈ dim GROUP BY dim.attr navigates the fact side to its snapshot") {
    // TPC-H Q5's shape, the commonest BI rollup. The snapshot (keyed on
    // the join key) replaces the fact scan; the join and dim subtree
    // are untouched. Exact because a fact group's rows all share the
    // join key: the group-row matches exactly the dim rows each member
    // row matched, so count→sum(cnt), sum→sum(sum_m) etc. carry over.
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-star").toString
    try {
      // fact with NULL join keys (inner join drops them identically on
      // both sides) and multiple rows per key
      val fact = (0 until 400).map { i =>
        (if (i % 19 == 0) null else java.lang.Long.valueOf(i % 37L),
          if (i % 2 == 0) "x" else "y", (i % 23).toDouble)
      }.toDF("fk", "flag", "v")
      fact.write.mode("overwrite").parquet(s"$dir/fact")
      // dim with DUPLICATE join keys (fan-out > 1) and unmatched keys
      val dim = ((0 until 30).map(i => (i.toLong, s"g${i % 5}")) ++
        Seq((3L, "g0"), (7L, "g2"), (100L, "g9"))).toDF("dk", "grp")
      dim.write.mode("overwrite").parquet(s"$dir/dim")
      Cdc.aggSnapshotMinMax(spark.read.parquet(s"$dir/fact"),
          Seq("fk", "flag"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      def reg() = MvRewrite.register(spark, s"$dir/fact", Seq("fk", "flag"),
        Seq("v"), s"$dir/snap", minMaxMeasures = Seq("v"))
      reg()
      try {
        def q() = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim"), col("fk") === col("dk"))
          .groupBy("grp")
          .agg(count(lit(1)).as("n"), sum("v").as("s"), avg("v").as("a"),
            min("v").as("mn"), max("v").as("mx"))
        val plan = scansOf(q())
        assert(plan.contains(s"$dir/snap") && !plan.contains(s"$dir/fact"),
          s"star rollup not navigated:\n$plan")
        assert(plan.contains(s"$dir/dim"), s"dim side disappeared:\n$plan")
        val got = q().orderBy("grp").collect().map(_.toString).toSeq
        MvRewrite.unregister(s"$dir/fact")
        val want = q().orderBy("grp").collect().map(_.toString).toSeq
        assert(got == want && want.nonEmpty,
          s"star answer diverged:\n$got\nvs\n$want")
        reg()
        // grouping by dim attr AND fact key together navigates
        val mixed = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim"), col("fk") === col("dk"))
          .groupBy("grp", "flag").agg(sum("v").as("s"))
        assert(scansOf(mixed).contains(s"$dir/snap"),
          s"dim+key grouping not navigated:\n${scansOf(mixed)}")
        // dim-side filter composes (replayed above the rebuilt join)
        val filtered = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim"), col("fk") === col("dk"))
          .filter(col("grp") =!= "g9" && col("flag") === "x")
          .groupBy("grp").agg(sum("v").as("s"))
        val fPlan = scansOf(filtered)
        assert(fPlan.contains(s"$dir/snap") && !fPlan.contains(s"$dir/fact"),
          s"filtered star not navigated:\n$fPlan")
        val gotF = filtered.orderBy("grp").collect().map(_.toString).toSeq
        MvRewrite.unregister(s"$dir/fact")
        val wantF = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim"), col("fk") === col("dk"))
          .filter(col("grp") =!= "g9" && col("flag") === "x")
          .groupBy("grp").agg(sum("v").as("s"))
          .orderBy("grp").collect().map(_.toString).toSeq
        assert(gotF == wantF && wantF.nonEmpty)
        reg()
        // an aggregate over a DIM column navigates too: countDistinct
        // is multiplicity-free, so it passes through over the rebuilt
        // snap ⋈ dim (the full count-weighted family has its own test)
        def dimAgg() = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim"), col("fk") === col("dk"))
          .groupBy("grp").agg(countDistinct("dk").as("nd"))
        assert(scansOf(dimAgg()).contains(s"$dir/snap") &&
            !scansOf(dimAgg()).contains(s"$dir/fact"),
          s"dim countDistinct not navigated:\n${scansOf(dimAgg())}")
        val gotDd = dimAgg().orderBy("grp").collect().map(_.toString).toSeq
        MvRewrite.unregister(s"$dir/fact")
        assert(gotDd == dimAgg().orderBy("grp").collect().map(_.toString).toSeq)
        reg()
        // NEGATIVE: joining on a NON-KEY fact column must bail (rows of
        // a group don't share it, so group-level matching is undefined)
        val badJoin = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim"), col("v") === col("dk"))
          .groupBy("grp").agg(count(lit(1)).as("n"))
        assert(scansOf(badJoin).contains(s"$dir/fact"),
          "non-key join wrongly navigated")
        // NEGATIVE: outer joins must bail (unmatched-side semantics)
        val outer = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim"), col("fk") === col("dk"), "left")
          .groupBy("grp").agg(count(lit(1)).as("n"))
        assert(scansOf(outer).contains(s"$dir/fact"),
          "outer join wrongly navigated")
        // NEGATIVE: a self-join (dim side scans the registered base)
        val self = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/fact").select(col("fk").as("fk2"),
            col("flag").as("flag2")), col("fk") === col("fk2"))
          .groupBy("flag2").agg(count(lit(1)).as("n"))
        assert(scansOf(self).contains(s"$dir/fact"),
          "self-join wrongly navigated")
      } finally MvRewrite.unregister(s"$dir/fact")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("multi-dim star: fact ⋈ dim1 ⋈ dim2 (the TPC-H Q5 shape) navigates the fact branch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-star2").toString
    try {
      val fact = (0 until 600).map { i =>
        (i % 41L, (i % 7).toLong, (i % 23).toDouble)
      }.toDF("fk1", "fk2", "v")
      fact.write.mode("overwrite").parquet(s"$dir/fact")
      (0 until 41).map(i => (i.toLong, s"g${i % 4}")).toDF("dk1", "grp1")
        .write.mode("overwrite").parquet(s"$dir/dim1")
      (0 until 7).map(i => (i.toLong, s"r${i % 3}")).toDF("dk2", "grp2")
        .write.mode("overwrite").parquet(s"$dir/dim2")
      Cdc.aggSnapshot(spark.read.parquet(s"$dir/fact"),
          Seq("fk1", "fk2"), Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      def reg() = MvRewrite.register(spark, s"$dir/fact", Seq("fk1", "fk2"),
        Seq("v"), s"$dir/snap")
      reg()
      try {
        def q() = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim1"), col("fk1") === col("dk1"))
          .join(spark.read.parquet(s"$dir/dim2"), col("fk2") === col("dk2"))
          .filter(col("grp2") =!= "r9")
          .groupBy("grp1", "grp2")
          .agg(count(lit(1)).as("n"), sum("v").as("s"), avg("v").as("a"))
        val plan = scansOf(q())
        assert(plan.contains(s"$dir/snap") && !plan.contains(s"$dir/fact"),
          s"multi-dim star not navigated:\n$plan")
        assert(plan.contains(s"$dir/dim1") && plan.contains(s"$dir/dim2"),
          s"a dim side disappeared:\n$plan")
        // the rebuilt chain must re-form EQUI-joins, not cartesians —
        // pushdown runs in the same fixed-point batch as the rewrite
        assert(!plan.contains("CartesianProduct"),
          s"rebuilt join degenerated to a cartesian:\n$plan")
        val got = q().orderBy("grp1", "grp2").collect().map(_.toString).toSeq
        MvRewrite.unregister(s"$dir/fact")
        val want = q().orderBy("grp1", "grp2").collect().map(_.toString).toSeq
        assert(got == want && want.nonEmpty,
          s"multi-dim star diverged:\n$got\nvs\n$want")
        reg()
        // three levels deep with a dim-side filter mid-spine
        val deep = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim1").filter(col("grp1") =!= "g3"),
            col("fk1") === col("dk1"))
          .join(spark.read.parquet(s"$dir/dim2"), col("fk2") === col("dk2"))
          .groupBy("grp2").agg(sum("v").as("s"))
        assert(scansOf(deep).contains(s"$dir/snap"),
          s"snowflake with dim filter not navigated:\n${scansOf(deep)}")
        // sum over a dim EXPRESSION (integral) navigates count-weighted
        // even with two dims in the chain
        def dimAgg() = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim1"), col("fk1") === col("dk1"))
          .join(spark.read.parquet(s"$dir/dim2"), col("fk2") === col("dk2"))
          .groupBy("grp1").agg(sum(length(col("grp2"))).as("s"))
        assert(scansOf(dimAgg()).contains(s"$dir/snap") &&
            !scansOf(dimAgg()).contains(s"$dir/fact"),
          s"dim-expression sum not navigated in multi-dim star:\n${scansOf(dimAgg())}")
        val gotDim = dimAgg().orderBy("grp1").collect().map(_.toString).toSeq
        MvRewrite.unregister(s"$dir/fact")
        assert(gotDim == dimAgg().orderBy("grp1").collect().map(_.toString).toSeq)
        reg()
      } finally MvRewrite.unregister(s"$dir/fact")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("star dim-attribute aggregates navigate by count-weighting") {
    // sum(dim.x) over fact ⋈ dim weights x by each fact group's SIZE —
    // the snapshot's cnt re-weights exactly for integral x (integer
    // arithmetic is order-free, even mod 2⁶⁴), and min/max/
    // count(DISTINCT) are multiplicity-free. Fractional dim attrs and
    // mixed fact+dim functions bail.
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-stardim").toString
    try {
      val fact = (0 until 500).map { i =>
        (i % 31L, if (i % 2 == 0) "x" else "y", (i % 17).toDouble)
      }.toDF("fk", "flag", "v")
      fact.write.mode("overwrite").parquet(s"$dir/fact")
      // dim carries an integral metric WITH NULLS, a fractional metric,
      // duplicate join keys (fan-out > 1) and unmatched keys
      val dim = ((0 until 25).map(i => (i.toLong, s"g${i % 4}",
          if (i % 6 == 0) null else java.lang.Long.valueOf((i % 9).toLong),
          i * 0.31)) ++
        Seq((4L, "g1", java.lang.Long.valueOf(5L), 1.7),
            (99L, "g9", java.lang.Long.valueOf(1L), 0.1)))
        .toDF("dk", "grp", "w", "d")
      dim.write.mode("overwrite").parquet(s"$dir/dim")
      Cdc.aggSnapshot(spark.read.parquet(s"$dir/fact"), Seq("fk", "flag"),
          Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      def reg() = MvRewrite.register(spark, s"$dir/fact", Seq("fk", "flag"),
        Seq("v"), s"$dir/snap")
      reg()
      try {
        def check(mk: => org.apache.spark.sql.DataFrame, label: String): Unit = {
          val plan = scansOf(mk)
          assert(plan.contains(s"$dir/snap") && !plan.contains(s"$dir/fact"),
            s"$label not navigated:\n$plan")
          val got = mk.orderBy("grp").collect().map(_.toString).toSeq
          MvRewrite.unregister(s"$dir/fact")
          val want = mk.orderBy("grp").collect().map(_.toString).toSeq
          reg()
          assert(got == want && want.nonEmpty,
            s"$label diverged:\n$got\nvs\n$want")
        }
        def base() = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim"), col("fk") === col("dk"))
        check(base().groupBy("grp").agg(sum("w").as("s")), "sum(dim int)")
        check(base().groupBy("grp").agg(count("w").as("c")),
          "count(dim int, null-skipping)")
        check(base().groupBy("grp").agg(avg("w").as("a")), "avg(dim int)")
        check(base().groupBy("grp").agg(min("d").as("mn"), max("d").as("mx")),
          "min/max(dim double)")
        check(base().groupBy("grp").agg(countDistinct("w").as("nd")),
          "count(distinct dim)")
        // distinct SKETCHES over dim values pass through too (KMV/HLL
        // insertion is idempotent per value — multiplicity-free), with
        // the estimator unchanged, so navigated == direct exactly
        check(base().groupBy("grp").agg(
          expr("kmv_distinct(w, 64)").as("kd"),
          approx_count_distinct("w").as("ad")),
          "distinct sketches over dim values")
        check(base().groupBy("grp").agg(
          expr("sum(w) FILTER (WHERE flag = 'x')").as("sf"),
          expr("count(*) FILTER (WHERE w > 3)").as("cf"),
          expr("sum(v) FILTER (WHERE w > 3)").as("vf")),
          "FILTER clauses over keys and dims")
        // NEGATIVE: fractional dim attr must bail (x+x+x ≠ 3·x in IEEE)
        assert(scansOf(base().groupBy("grp").agg(sum("d").as("s")))
          .contains(s"$dir/fact"), "fractional dim sum wrongly navigated")
        // NEGATIVE: a function mixing fact and dim references must bail
        assert(scansOf(base().groupBy("grp")
            .agg(sum(col("v") + col("w")).as("s")))
          .contains(s"$dir/fact"), "mixed fact+dim sum wrongly navigated")
        // NEGATIVE: sum(DISTINCT dim) has no weighted form — bail
        assert(scansOf(base().groupBy("grp")
            .agg(sum_distinct(col("w")).as("s")))
          .contains(s"$dir/fact"), "sum(DISTINCT dim) wrongly navigated")
      } finally MvRewrite.unregister(s"$dir/fact")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("rollup over a star: the Expand rebuilds above snapshot ⋈ dim") {
    // the full BI cube shape — fact ⋈ dim, subtotals over (dim.attr,
    // fact.key). The Expand passes the dim's columns through every
    // projection row; a masked key that IS a dim attribute re-emits
    // inline (the dim subtree keeps its exprIds); fact measures map to
    // the snapshot's partials and dim aggregates count-weight, per
    // (masked keys, gid) cell. SQL throughout: the Dataset API's
    // rollup-over-join trips Spark's DetectAmbiguousSelfJoin at
    // ANALYSIS time, before any optimizer extension runs — a
    // pre-existing quirk independent of MvRewrite (and GROUP BY
    // ROLLUP is the shape BI tools emit anyway).
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-starroll").toString
    try {
      val fact = (0 until 400).map { i =>
        (i % 29L, if (i % 2 == 0) "x" else "y", (i % 19).toDouble)
      }.toDF("fk", "flag", "v")
      fact.write.mode("overwrite").parquet(s"$dir/fact")
      val dim = (0 until 35).map(i => (i.toLong, s"g${i % 4}", (i % 7).toLong))
        .toDF("dk", "grp", "w")
      dim.write.mode("overwrite").parquet(s"$dir/dim")
      Cdc.aggSnapshot(spark.read.parquet(s"$dir/fact"), Seq("fk", "flag"),
          Seq("v"))
        .write.mode("overwrite").parquet(s"$dir/snap")
      spark.read.parquet(s"$dir/fact").createOrReplaceTempView("sr_f")
      spark.read.parquet(s"$dir/dim").createOrReplaceTempView("sr_d")
      def reg() = MvRewrite.register(spark, s"$dir/fact", Seq("fk", "flag"),
        Seq("v"), s"$dir/snap")
      reg()
      try {
        def check(sql: String, label: String): Unit = {
          val plan = scansOf(spark.sql(sql))
          assert(plan.contains(s"$dir/snap") && !plan.contains(s"$dir/fact"),
            s"$label not navigated:\n$plan")
          val got = spark.sql(sql).collect().map(_.toString).sorted.toSeq
          MvRewrite.unregister(s"$dir/fact")
          val want = spark.sql(sql).collect().map(_.toString).sorted.toSeq
          reg()
          assert(got == want && want.nonEmpty,
            s"$label diverged:\n$got\nvs\n$want")
        }
        check("""SELECT grp, flag, count(*) AS n, sum(v) AS s
                 FROM sr_f JOIN sr_d ON fk = dk GROUP BY ROLLUP(grp, flag)""",
          "rollup(dim.attr, fact.key)")
        check("""SELECT grp, flag, sum(v) AS s, avg(v) AS a, sum(w) AS sw
                 FROM sr_f JOIN sr_d ON fk = dk GROUP BY CUBE(grp, flag)""",
          "cube with a dim-attribute aggregate")
        check("""SELECT flag, count(*) AS n, count(DISTINCT w) AS nd
                 FROM sr_f JOIN sr_d ON fk = dk WHERE grp <> 'g3'
                 GROUP BY ROLLUP(flag)""",
          "filtered rollup over the join")
        // SQL aggregate args reference the UNMASKED base column (it
        // passes through the Expand — standard semantics), so even an
        // aggregate over the rolled-up dim attr count-weights exactly.
        // (The masked-OUTPUT-attr bail is pinned by the plain
        // grouping-sets suite's negative.)
        check("""SELECT grp, flag, sum(length(grp)) AS s
                 FROM sr_f JOIN sr_d ON fk = dk GROUP BY ROLLUP(grp, flag)""",
          "aggregate over the unmasked rolled-up dim attr")
        // NEGATIVE: rolling up a non-key fact column bails
        assert(scansOf(spark.sql(
            """SELECT grp, v, count(*) AS n
               FROM sr_f JOIN sr_d ON fk = dk GROUP BY ROLLUP(grp, v)"""))
          .contains(s"$dir/fact"), "non-key rollup wrongly navigated")
      } finally {
        MvRewrite.unregister(s"$dir/fact")
        spark.catalog.dropTempView("sr_f")
        spark.catalog.dropTempView("sr_d")
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("rollup/cube/grouping-sets navigate: the Expand rebuilds over the snapshot") {
    withSnapshot { snapPath =>
      // rollup: subtotal + grand-total rows from the kilobyte snapshot —
      // the Expand's masked-key/gid columns survive with their exprIds,
      // the measure positions map to the snapshot's partial columns
      def roll() = spark.read.parquet(basePath)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"),
          avg("l_quantity").as("a"))
      val plan = scansOf(roll())
      assert(plan.contains(snapPath) && !plan.contains("lineitem.parquet"),
        s"rollup not navigated:\n$plan")
      val got = roll().orderBy("l_returnflag", "l_linestatus")
        .collect().map(_.toString).toSeq
      MvRewrite.unregister(basePath)
      val want = roll().orderBy("l_returnflag", "l_linestatus")
        .collect().map(_.toString).toSeq
      assert(got == want && want.nonEmpty, s"rollup diverged:\n$got\nvs\n$want")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      // cube + grouping()/grouping_id() outputs (expressions over the
      // gid column) compose; a key filter below still replays
      spark.read.parquet(basePath).createOrReplaceTempView("li_mv_gs")
      def cube() = spark.sql(
        """SELECT l_returnflag, l_linestatus, grouping(l_returnflag) AS gr,
          |       grouping_id() AS gid, count(*) AS n, sum(l_quantity) AS s
          |FROM li_mv_gs WHERE l_returnflag <> 'Z'
          |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)
      val cPlan = scansOf(cube())
      assert(cPlan.contains(snapPath) && !cPlan.contains("lineitem.parquet"),
        s"cube not navigated:\n$cPlan")
      val gotC = cube().orderBy("gid", "l_returnflag", "l_linestatus")
        .collect().map(_.toString).toSeq
      MvRewrite.unregister(basePath)
      val wantC = cube().orderBy("gid", "l_returnflag", "l_linestatus")
        .collect().map(_.toString).toSeq
      assert(gotC == wantC && wantC.nonEmpty, s"cube diverged")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      // explicit GROUPING SETS with an unmasked (every-set) key
      def gs() = spark.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS s
          |FROM li_mv_gs
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))""".stripMargin)
      assert(scansOf(gs()).contains(snapPath),
        s"grouping sets not navigated:\n${scansOf(gs())}")
      val gotG = gs().orderBy("l_returnflag", "l_linestatus")
        .collect().map(_.toString).toSeq
      MvRewrite.unregister(basePath)
      val wantG = gs().orderBy("l_returnflag", "l_linestatus")
        .collect().map(_.toString).toSeq
      assert(gotG == wantG && wantG.nonEmpty)
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      // NEGATIVE: an aggregate over a masked grouping column (sees the
      // Expand's nulls) must bail
      val maskedAgg = spark.sql(
        """SELECT count(l_linestatus) AS n FROM li_mv_gs
          |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)
      assert(scansOf(maskedAgg).contains("lineitem.parquet"),
        "aggregate over a masked grouping column wrongly navigated")
      // NEGATIVE: rollup including a NON-key column must bail
      val nonKey = spark.read.parquet(basePath)
        .rollup("l_returnflag", "l_shipdate")
        .agg(sum("l_quantity").as("s"))
      assert(scansOf(nonKey).contains("lineitem.parquet"),
        "rollup over a non-key column wrongly navigated")
    }
  }

  test("explainNavigation answers why a query did or didn't navigate") {
    assert(MvRewrite.explainNavigation(
      spark.read.parquet(basePath).groupBy("l_returnflag").agg(sum("l_quantity")))
      .contains("no views registered"))
    withSnapshot { snapPath =>
      val navigated = spark.read.parquet(basePath)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      val r1 = MvRewrite.explainNavigation(navigated)
      assert(r1.contains("NAVIGATED") && r1.contains(snapPath), r1)
      val bailed = spark.read.parquet(basePath)
        .filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      val r2 = MvRewrite.explainNavigation(bailed)
      assert(r2.contains("NOT NAVIGATED") && r2.contains("unanswerable"), r2)
      val unrelated = spark.read.parquet(s"${TestSession.sf0001}/orders.parquet")
        .groupBy("o_orderstatus").agg(count(lit(1)))
      val r3 = MvRewrite.explainNavigation(unrelated)
      assert(r3.contains("NOT REFERENCED"), r3)
    }
  }

  test("unanswerable shapes are left untouched") {
    withSnapshot { _ =>
      // a filter means the snapshot can't answer
      val filtered = spark.read.parquet(basePath)
        .filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(sum("l_quantity"))
      assert(scansOf(filtered).contains("lineitem.parquet"))
      // an unregistered measure can't be answered
      val otherMeasure = spark.read.parquet(basePath)
        .groupBy("l_returnflag").agg(sum("l_extendedprice"))
      assert(scansOf(otherMeasure).contains("lineitem.parquet"))
      // min() is not in the snapshot
      val minQ = spark.read.parquet(basePath)
        .groupBy("l_returnflag").agg(min("l_quantity"))
      assert(scansOf(minQ).contains("lineitem.parquet"))
      // grouping by a non-key column can't be answered
      val otherKey = spark.read.parquet(basePath)
        .groupBy("l_shipdate").agg(sum("l_quantity"))
      assert(scansOf(otherKey).contains("lineitem.parquet"))
    }
  }

  test("aggregate FILTER clauses: key predicates navigate exactly, anything else bails") {
    withSnapshot { snapPath =>
      // FILTER (WHERE keyPred) selects WHOLE groups — it replays inside
      // the rewritten aggregate over the snapshot's key columns, so the
      // pivot-style dashboard shape (conditional counts per segment)
      // navigates with EXACT values, including the all-filtered-out
      // NULL-sum case.
      def q() = spark.read.parquet(basePath)
        .groupBy("l_returnflag")
        .agg(
          expr("sum(l_quantity) FILTER (WHERE l_linestatus = 'O')").as("s"),
          expr("avg(l_quantity) FILTER (WHERE l_linestatus = 'O')").as("a"),
          expr("count(*) FILTER (WHERE l_linestatus = 'O')").as("n"),
          expr("count(*) FILTER (WHERE l_linestatus = 'NOPE')").as("zero"),
          expr("sum(l_quantity) FILTER (WHERE l_linestatus = 'NOPE')").as("nul"),
          sum("l_quantity").as("plain"))
      val plan = scansOf(q())
      assert(plan.contains(snapPath) && !plan.contains("lineitem.parquet"),
        s"key-predicate FILTER aggregate must navigate:\n$plan")
      val got = q().orderBy("l_returnflag").collect().map(_.toString).toSeq
      MvRewrite.unregister(basePath)
      val want = q().orderBy("l_returnflag").collect().map(_.toString).toSeq
      assert(got == want && want.nonEmpty,
        s"FILTER-navigated answer diverged:\n$got\nvs\n$want")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), snapPath)
      // a FILTER referencing a MEASURE selects a per-row subset the
      // snapshot cannot see — the whole query must stay on the base
      val rowLevel = spark.read.parquet(basePath)
        .groupBy("l_returnflag")
        .agg(expr("count(*) FILTER (WHERE l_quantity > 10)").as("n"))
      assert(scansOf(rowLevel).contains("lineitem.parquet"),
        "measure-predicate FILTER wrongly navigated")
      // ...including when mixed with navigable aggregates
      val mixed = spark.read.parquet(basePath)
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("s"),
          expr("count(*) FILTER (WHERE l_shipdate > DATE'1995-01-01')").as("n"))
      assert(scansOf(mixed).contains("lineitem.parquet"),
        "non-key FILTER in a mixed aggregate list wrongly navigated")
    }
  }

  test("filtered (partial) view: only queries carrying the predicate navigate; coexists with the full view") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mvf").toString
    try {
      val base = spark.read.parquet(basePath)
      // a NON-key predicate — the case a full view can never answer
      // (non-key filters select partial groups): the hot-subset MV
      val pred = col("l_quantity") > 25
      Cdc.aggSnapshot(base.filter(pred), keys, Seq("l_quantity"))
        .write.mode("overwrite").parquet(s"$dir/hot")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"),
        s"$dir/hot", predicate = Some(pred))
      def hotQ() = spark.read.parquet(basePath)
        .filter(col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
      val plan = scansOf(hotQ())
      assert(plan.contains(s"$dir/hot") && !plan.contains("lineitem.parquet"),
        s"predicate-carrying query must navigate the filtered view:\n$plan")
      val got = hotQ().orderBy("l_returnflag")
        .as[(String, Long, Double)].collect().toSeq
      MvRewrite.clear()
      val want = hotQ().orderBy("l_returnflag")
        .as[(String, Long, Double)].collect().toSeq
      assert(got == want && want.nonEmpty,
        s"filtered-view answer diverged:\n$got\nvs\n$want")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"),
        s"$dir/hot", predicate = Some(pred))
      // predicate + additional KEY conjunct: predicate consumed, the
      // key filter replays over the snapshot — still navigated, exact
      def hotKeyQ() = spark.read.parquet(basePath)
        .filter(col("l_quantity") > 25 && col("l_returnflag") === "A")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
      assert(scansOf(hotKeyQ()).contains(s"$dir/hot"),
        "predicate + key-conjunct query must still navigate")
      val got2 = hotKeyQ().orderBy("l_linestatus")
        .as[(String, Long, Double)].collect().toSeq
      MvRewrite.clear()
      assert(got2 == hotKeyQ().orderBy("l_linestatus")
        .as[(String, Long, Double)].collect().toSeq)
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"),
        s"$dir/hot", predicate = Some(pred))
      // a query WITHOUT the predicate — or with a weaker/different one —
      // keeps its complete direct scan: a subset never answers for the
      // whole (exact-conjunct matching, no implication reasoning)
      val unfiltered = spark.read.parquet(basePath)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(scansOf(unfiltered).contains("lineitem.parquet"),
        "unfiltered query wrongly navigated a partial view")
      val weaker = spark.read.parquet(basePath)
        .filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(scansOf(weaker).contains("lineitem.parquet"),
        "weaker predicate (>10) wrongly navigated the >25 view")
      // the FULL view registers alongside on the SAME (base, keys) —
      // distinct entry keys — and the unfiltered query now navigates to
      // it while the hot query keeps the (smaller) filtered snapshot
      Cdc.aggSnapshot(base, keys, Seq("l_quantity"))
        .write.mode("overwrite").parquet(s"$dir/full")
      MvRewrite.register(spark, basePath, keys, Seq("l_quantity"), s"$dir/full")
      assert(scansOf(spark.read.parquet(basePath)
          .groupBy("l_returnflag").agg(sum("l_quantity").as("s")))
        .contains(s"$dir/full"), "full view must serve the unfiltered query")
      assert(scansOf(hotQ()).contains(s"$dir/hot"),
        "filtered query must prefer the more selective view")
    } finally {
      MvRewrite.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
