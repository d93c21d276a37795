package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sketches
import graft.functions.Kmv

/** KMV distinct-count sketches: the deterministic mergeable machinery
  * behind `kmv_distinct`, snapshot `kmv_<c>` columns, and MvRewrite's
  * distinct-count navigation. The load-bearing property is EXACT
  * mergeability: rollup(partials) equals the whole-data sketch array
  * bit-for-bit (order statistic, not randomized), which is what makes
  * streamed snapshot maintenance == rebuild and navigated == direct. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("kmv_distinct is EXACT below k (dupes collapse, nulls skipped)") {
    val df = Seq[(String, java.lang.Long)](
      ("a", 1L), ("a", 1L), ("a", 2L), ("a", null), ("a", 3L),
      ("b", 7L), ("b", 7L)).toDF("k", "v")
    val got = df.groupBy("k")
      .agg(expr("kmv_distinct(v)").as("d"), countDistinct("v").as("exact"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 3L), ("b", 1L, 1L)))
  }

  test("rollup(partials) == whole-data sketch EXACTLY (arrays, not just estimates)") {
    // 3 "days" with overlapping value ranges; per-day partials merged up
    // must equal the sketch built over all rows in one pass
    val rows = for {
      day <- 1 to 3
      i <- 0 until 4000
    } yield (day, s"user_${(i * day * 7919) % 9000}")
    val df = rows.toDF("day", "user")
    val partials = Sketches.kmvPartials(df, Seq("day"), "user")
    val merged = Sketches.kmvRollup(partials, Seq.empty)
      .select("kmv", "distinct_est").as[(Array[Long], Long)].collect().head
    val whole = Sketches.kmvPartials(df.select(lit(1).as("g"), col("user")), Seq("g"), "user")
      .select(Sketches.kmvEstimate(col("kmv")).as("est"), col("kmv"))
      .as[(Long, Array[Long])].collect().head
    assert(merged._1.toSeq == whole._2.toSeq,
      "merged sketch diverged from whole-data sketch")
    assert(merged._2 == whole._1)
    // and the Column-side estimate equals the aggregate-side estimator
    assert(merged._2 == Kmv.estimate(merged._1, Kmv.DefaultK))
  }

  test("estimate accuracy: within the KMV error bound at 20k distinct") {
    val n = 20000
    val df = (0 until n).map(i => ("g", s"id_$i")).toDF("k", "v")
    val est = df.groupBy("k").agg(expr("kmv_distinct(v)").as("d"))
      .as[(String, Long)].collect().head._2
    // std err ~ 1/sqrt(k-2) ~ 12.7% at k=64; assert a 3-sigma band
    assert(math.abs(est - n).toDouble / n < 0.38,
      s"kmv estimate $est too far from $n")
    // higher k tightens it
    val est256 = df.groupBy("k").agg(expr("kmv_distinct(v, 256)").as("d"))
      .as[(String, Long)].collect().head._2
    assert(math.abs(est256 - n).toDouble / n < 0.19,
      s"kmv(256) estimate $est256 too far from $n")
  }

  test("kmvIntersectEstimate: exact below k; within the estimator band at scale") {
    // below k the sketches ARE the hashed sets, so the overlap is exact
    val small = Seq(
      ("a", "x1"), ("a", "x2"), ("a", "x3"), ("a", "shared1"), ("a", "shared2"),
      ("b", "y1"), ("b", "shared1"), ("b", "shared2")).toDF("seg", "v")
    val sk = graft.ops.Sketches.kmvPartials(small, Seq("seg"), "v")
    val pair = sk.agg(
      first(when(col("seg") === "a", col("kmv")), ignoreNulls = true).as("ka"),
      first(when(col("seg") === "b", col("kmv")), ignoreNulls = true).as("kb"))
    val (exactSmall, jac) = pair.select(
      graft.ops.Sketches.kmvIntersectEstimate(col("ka"), col("kb")).as("i"),
      graft.ops.Sketches.kmvJaccard(col("ka"), col("kb")).as("j"))
      .as[(Long, Double)].collect().head
    assert(exactSmall == 2L)
    // |A∪B| = 6 (x1 x2 x3 y1 shared1 shared2), |A∩B| = 2 → 1/3 exactly
    assert(jac == 2.0 / 6.0)
    // at scale: 12k + 8k distinct with 3k shared; k=256 keeps the
    // ratio-estimator's 3-sigma band under ~45%
    val big = ((0 until 12000).map(i => ("a", s"a$i")) ++
      (0 until 8000).map(i => ("b", s"b$i")) ++
      (0 until 3000).flatMap(i => Seq(("a", s"s$i"), ("b", s"s$i")))).toDF("seg", "v")
    val skb = graft.ops.Sketches.kmvPartials(big, Seq("seg"), "v", k = 256)
    val est = skb.agg(
      first(when(col("seg") === "a", col("kmv")), ignoreNulls = true).as("ka"),
      first(when(col("seg") === "b", col("kmv")), ignoreNulls = true).as("kb"))
      .select(graft.ops.Sketches.kmvIntersectEstimate(col("ka"), col("kb"), 256).as("i"))
      .as[Long].collect().head
    assert(math.abs(est - 3000).toDouble / 3000 < 0.45,
      s"overlap estimate $est too far from 3000")
  }

  test("kmvOverlapMatrix: all-pairs estimates exact below k, ordered pairs only") {
    val rows = Seq(
      ("s1", "a"), ("s1", "b"), ("s1", "c"),
      ("s2", "b"), ("s2", "c"), ("s2", "d"),
      ("s3", "x")).toDF("seg", "v")
    val m = graft.ops.Sketches.kmvOverlapMatrix(
        graft.ops.Sketches.kmvPartials(rows, Seq("seg"), "v"), "seg")
      .orderBy("seg_a", "seg_b")
      .as[(String, String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(m.map(p => (p._1, p._2)) == Seq(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    val m12 = m.find(p => p._1 == "s1" && p._2 == "s2").get
    assert((m12._3, m12._4, m12._5, m12._6) == (3L, 3L, 4L, 2L)) // |∪|=4, |∩|=2
    assert(m12._7 == 0.5)
    val m13 = m.find(p => p._1 == "s1" && p._2 == "s3").get
    assert(m13._6 == 0L && m13._7 == 0.0) // disjoint
  }

  test("tuple sketches: merge == rebuild exactly; exact pair counts below k") {
    // composite distinct keys ("distinct (user, day) pairs"): the tuple
    // canonicalizes through concat_ws + fnv64, so the same order-
    // statistic law must hold — an append-only refresh of the tuple
    // sketch equals the sketch rebuilt over all rows, array-for-array
    val rows = (0 until 3000).map { i =>
      (s"seg_${i % 4}", (i % 100).toDouble, s"u${i % 57}", s"d${(i / 57) % 23}")
    }
    val df = rows.toDF("k", "v", "user", "day")
    val base = df.filter(col("user") =!= "u3")
    val delta = df.filter(col("user") === "u3")
    val tuples = Seq(Seq("user", "day"))
    val refreshed = graft.ops.Cdc.incrementalAggRefreshAppendOnly(
        graft.ops.Cdc.aggSnapshotMinMax(base, Seq("k"), Seq("v"),
          distinctTuples = tuples),
        delta, Seq("k"), Seq("v"), distinctTuples = tuples)
      .orderBy("k").select("k", "kmv_user__day")
      .as[(String, Array[Long])].collect().toSeq
    val rebuilt = graft.ops.Cdc.aggSnapshotMinMax(df, Seq("k"), Seq("v"),
        distinctTuples = tuples)
      .orderBy("k").select("k", "kmv_user__day")
      .as[(String, Array[Long])].collect().toSeq
    assert(refreshed.map(_._1) == rebuilt.map(_._1))
    refreshed.zip(rebuilt).foreach { case ((k, a), (_, b)) =>
      assert(a.toSeq == b.toSeq, s"tuple sketch for $k diverged from rebuild")
    }
    // below k the sketch is exact: estimate == countDistinct(user, day)
    val small = rows.take(200).toDF("k", "v", "user", "day")
    val est = small.groupBy("k")
      .agg(call_function("kmv_distinct",
        Sketches.tupleKey(col("user"), col("day"))).as("d"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    val exact = small.groupBy("k")
      .agg(countDistinct(col("user"), col("day")).as("d"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(est == exact, s"tuple kmv below k not exact:\n$est\nvs\n$exact")
  }

  test("kmvOverlapMatrix refuses a high-cardinality segment key") {
    val partials = Sketches.kmvPartials(
      (0 until 40).map(i => (s"seg$i", s"v$i")).toDF("seg", "v"), Seq("seg"), "v")
    val e = intercept[IllegalArgumentException](
      Sketches.kmvOverlapMatrix(partials, "seg", maxSegments = 10))
    assert(e.getMessage.contains("quadratic"))
    // raising the cap consciously still works
    assert(Sketches.kmvOverlapMatrix(partials, "seg", maxSegments = 50)
      .count() == 40L * 39 / 2)
  }

  test("S6f snapshot KLL: append-only refresh tracks rebuild within the rank-error band") {
    // the quantile family is maintained in snapshots but its compaction
    // is randomized, so the law is tolerance, not hash: quantiles read
    // from the incrementally-merged sketch sit within the combined
    // rank-error bound of quantiles from a one-pass rebuild
    val rows = (0 until 20000).map { i =>
      (s"g${i % 3}", ((i * 7919) % 10007).toDouble)
    }
    val df = rows.toDF("k", "v")
    val base = df.filter(col("v") < 8000) // skewed split: deltas shift the tail
    val delta = df.filter(col("v") >= 8000)
    val refreshed = graft.ops.Cdc.incrementalAggRefreshAppendOnly(
      graft.ops.Cdc.aggSnapshotMinMax(base, Seq("k"), Seq("v"), kllCols = Seq("v")),
      delta, Seq("k"), Seq("v"), kllCols = Seq("v"))
    val exact = df.groupBy("k")
      .agg(expr("percentile(v, array(0.5, 0.9))").as("p"))
      .orderBy("k").as[(String, Seq[Double])].collect().toMap
    // value tolerance from the rank bound: 1.65% rank error over a
    // ~uniform 0..10007 support ≈ ±165 in value; allow 3x
    refreshed.select(col("k"),
        kll_sketch_get_quantile_double(col("kll_v"), lit(0.5)).as("p50"),
        kll_sketch_get_quantile_double(col("kll_v"), lit(0.9)).as("p90"))
      .orderBy("k").as[(String, Double, Double)].collect().foreach {
        case (k, p50, p90) =>
          val Seq(e50, e90) = exact(k)
          assert(math.abs(p50 - e50) < 500, s"$k p50 $p50 vs exact $e50")
          assert(math.abs(p90 - e90) < 500, s"$k p90 $p90 vs exact $e90")
      }
  }

  test("iqrOutliersKll tracks the exact IQR gate within the KLL rank-error band") {
    // The scale-safe fence path must agree with the exact q_outliers
    // design on real data: fences within the sketch's rank error of the
    // exact percentile fences, and the flagged-row count close. KLL
    // rank error at k=200 is ~1.65%; fences amplify it by the IQR
    // arithmetic, so the value tolerance is a conservative 5% of IQR.
    val li = spark.read.parquet(s"${TestSession.sf0001}/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.25)").as("q1"),
        expr("percentile(l_extendedprice, 0.75)").as("q3"))
      .select(col("l_returnflag"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"),
        (col("q3") - col("q1")).as("iqr"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val sketched = graft.ops.Sketches
      .iqrOutliersKll(li, Seq("l_returnflag"), "l_extendedprice")
      .select("l_returnflag", "lo", "hi", "n_outliers", "n_rows")
      .as[(String, Double, Double, Long, Long)].collect()
    assert(sketched.map(_._1).toSet == exact.keySet)
    sketched.foreach { case (k, lo, hi, nOut, nRows) =>
      val (elo, ehi, iqr) = exact(k)
      assert(math.abs(lo - elo) <= 0.05 * iqr, s"$k: lo $lo vs exact $elo (iqr $iqr)")
      assert(math.abs(hi - ehi) <= 0.05 * iqr, s"$k: hi $hi vs exact $ehi (iqr $iqr)")
      // fences sit in the distribution tail, so a small fence shift
      // moves few rows: the flagged fraction must stay within 1% of
      // the group absolute
      assert(nRows > 0 && nOut >= 0 && nOut < nRows)
    }
  }

  test("SQL surface: kmv_sketch / kmv_union / kmv_union_est compose") {
    Seq((1, "x"), (1, "y"), (2, "y"), (2, "z")).toDF("part", "v")
      .createOrReplaceTempView("kmv_src")
    val sketches = spark.sql(
      """SELECT part, kmv_sketch(fnv64(CAST(v AS STRING))) AS kmv
        |FROM kmv_src GROUP BY part""".stripMargin)
    sketches.createOrReplaceTempView("kmv_parts")
    val est = spark.sql("SELECT kmv_union_est(kmv) AS d FROM kmv_parts")
      .as[Long].collect().head
    assert(est == 3L) // x, y, z — union dedupes the shared y
    val mergedSize = spark.sql("SELECT size(kmv_union(kmv)) AS s FROM kmv_parts")
      .as[Int].collect().head
    assert(mergedSize == 3)
  }
}
