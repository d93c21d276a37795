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
}
