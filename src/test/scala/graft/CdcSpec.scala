package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ops.Cdc

class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "v", "x")

  test("upsert replaces, insert appends, delete vanishes") {
    val changes = Seq(
      (2L, "b2", 21.0, 1L, false),  // update
      (3L, "c", 30.0, 1L, true),    // delete
      (9L, "new", 90.0, 1L, false)  // insert
    ).toDF("k", "v", "x", "seq", "del")
    val got = Cdc.mergeUpsert(target, changes, Seq("k"), "seq", "del")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (9L, "new", 90.0)))
  }

  test("broadcastKeys = false (backfill regime) matches the broadcast path") {
    val changes = Seq(
      (2L, "b2", 21.0, 1L, false),
      (3L, "c", 30.0, 1L, true),
      (9L, "new", 90.0, 1L, false)
    ).toDF("k", "v", "x", "seq", "del")
    val got = Cdc.mergeUpsert(target, changes, Seq("k"), "seq", "del",
        broadcastKeys = false)
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (9L, "new", 90.0)))
  }

  test("latest sequence wins, including delete-then-reinstate") {
    val changes = Seq(
      (1L, "v1", 11.0, 1L, false),
      (1L, "v2", 12.0, 2L, false),  // later version wins
      (2L, "gone", 0.0, 1L, true),
      (2L, "back", 22.0, 2L, false) // reinstated after delete
    ).toDF("k", "v", "x", "seq", "del")
    val got = Cdc.mergeUpsert(target, changes, Seq("k"), "seq", "del")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "v2", 12.0), (2L, "back", 22.0), (3L, "c", 30.0)))
  }

  test("delete as the latest version removes an updated row") {
    val changes = Seq(
      (1L, "v1", 11.0, 1L, false),
      (1L, "v1", 11.0, 2L, true)
    ).toDF("k", "v", "x", "seq", "del")
    val got = Cdc.mergeUpsert(target, changes, Seq("k"), "seq", "del")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("composite keys and an empty change batch") {
    val t2 = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val empty = Seq.empty[(Long, String, Double, Long, Boolean)]
      .toDF("k1", "k2", "v", "seq", "del")
    assert(Cdc.mergeUpsert(t2, empty, Seq("k1", "k2"), "seq", "del")
      .count() == 2)
    val ch = Seq((1L, "y", 9.0, 1L, false)).toDF("k1", "k2", "v", "seq", "del")
    val got = Cdc.mergeUpsert(t2, ch, Seq("k1", "k2"), "seq", "del")
      .orderBy("k2").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "x", 1.0), (1L, "y", 9.0)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, null-safe") {
    val old = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, None, 30.0),
      (4L, Some("d"), 40.0)
    ).toDF("k", "v", "x")
    val neu = Seq(
      (2L, Some("b"), 20.0),   // unchanged
      (3L, None, 30.0),        // unchanged (null == null under <=>)
      (4L, None, 40.0),        // changed (d -> null)
      (5L, Some("e"), 50.0)    // added
    ).toDF("k", "v", "x")      // key 1 removed
    val got = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("v", "x"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "removed"), (2L, "unchanged"), (3L, "unchanged"),
      (4L, "changed"), (5L, "added")))
  }

  test("snapshotDiff: composite key and single compare column") {
    val old = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val neu = Seq((1L, "x", 1.5), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val got = Cdc.snapshotDiff(old, neu, Seq("k1", "k2"), Seq("v"))
      .orderBy("k2").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("x", "changed"), ("y", "unchanged")))
  }

  test("incrementalAggRefresh equals a direct recompute; groups vanish and appear") {
    val base = Seq(
      ("a", 1.0), ("a", 2.0), ("b", 5.0), ("c", 7.0)
    ).toDF("k", "v")
    val baseAgg = Cdc.aggSnapshot(base, Seq("k"), Seq("v"))
    val delta = Seq(
      ("a", 3.0, 1),   // insert into existing group
      ("b", 5.0, -1),  // retract b's only row -> group vanishes
      ("d", 9.0, 1)    // brand-new group appears
    ).toDF("k", "v", "op")
    val refreshed = Cdc.incrementalAggRefresh(baseAgg, delta, Seq("k"), "op", Seq("v"))
    val got = Cdc.aggView(refreshed, Seq("v"))
      .orderBy("k").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 3L, 6.0), ("c", 1L, 7.0), ("d", 1L, 9.0)))
    // equals the direct aggregate over the post-change row set — the
    // snapshot representation itself (long fixed-point), not a view
    val finalRows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("c", 7.0), ("d", 9.0))
      .toDF("k", "v")
    val direct = Cdc.aggSnapshot(finalRows, Seq("k"), Seq("v"))
      .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
    assert(refreshed.orderBy("k").as[(String, Long, Long, Long)].collect().toSeq == direct)
  }

  test("refresh == rebuild EXACTLY under heavy retraction (values that drift as doubles)") {
    // 0.1 is inexact in binary; summing thousands of them in different
    // orders yields different doubles. The snapshot must not care:
    // base has 4000 rows per key, the delta retracts 3999 of them and
    // reinserts others — refresh must be BIT-identical to rebuild.
    val rnd = new scala.util.Random(42)
    val baseRows = (0 until 8000).map(i =>
      (if (i % 2 == 0) "x" else "y", 0.01 * (rnd.nextInt(100000) - 50000)))
    val base = baseRows.toDF("k", "v")
    val baseAgg = Cdc.aggSnapshot(base, Seq("k"), Seq("v"))
    // retract-everything-then-reinsert for key x; partial churn for y
    val retractX = baseRows.filter(_._1 == "x").map { case (k, v) => (k, v, -1) }
    val reinsertX = baseRows.filter(_._1 == "x").reverse.map { case (k, v) => (k, v, 1) }
    val churnY = baseRows.filter(_._1 == "y").take(3999).map { case (k, v) => (k, v, -1) }
    val delta = (retractX ++ reinsertX ++ churnY).toDF("k", "v", "op")
    val refreshed = Cdc.incrementalAggRefresh(baseAgg, delta, Seq("k"), "op", Seq("v"))
      .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
    val finalRows = (baseRows.filter(_._1 == "x") ++
      baseRows.filter(_._1 == "y").drop(3999)).toDF("k", "v")
    val rebuilt = Cdc.aggSnapshot(finalRows, Seq("k"), Seq("v"))
      .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
    assert(refreshed == rebuilt,
      s"incremental refresh drifted from rebuild: $refreshed vs $rebuilt")
  }

  test("retract-everything leaves an empty snapshot; re-refresh from empty works") {
    val base = Seq(("a", 1.5), ("a", 2.5), ("b", 3.25)).toDF("k", "v")
    val baseAgg = Cdc.aggSnapshot(base, Seq("k"), Seq("v"))
    val retractAll = Seq(("a", 1.5, -1), ("a", 2.5, -1), ("b", 3.25, -1))
      .toDF("k", "v", "op")
    val emptied = Cdc.incrementalAggRefresh(baseAgg, retractAll, Seq("k"), "op", Seq("v"))
    assert(emptied.count() == 0)
    // a subsequent delta against the emptied snapshot seeds fresh groups
    val reborn = Cdc.incrementalAggRefresh(emptied,
      Seq(("a", 9.75, 1)).toDF("k", "v", "op"), Seq("k"), "op", Seq("v"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(reborn == Seq(("a", 1L, 975L, 1L)))
  }

  test("NULL measures: refresh == rebuild; aggView presents all-NULL groups as NULL sum") {
    // cnt_<m> tracks the measure's NON-NULL count: retracting a
    // NULL-measure row must not decrement it, and a group whose every
    // value is NULL presents sum NULL (not 0) through aggView.
    val base = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", null), ("b", null), ("b", null), ("c", 2.0))
      .toDF("k", "v")
    val baseAgg = Cdc.aggSnapshot(base, Seq("k"), Seq("v"))
    val delta = Seq[(String, java.lang.Double, java.lang.Integer)](
      ("a", null, -1),  // retract a's NULL row: cnt drops, cnt_v must not
      ("b", 5.0, 1),    // b gains its first non-null value
      ("c", 2.0, -1), ("c", null, 1) // c becomes all-NULL
    ).toDF("k", "v", "op")
    val refreshed = Cdc.incrementalAggRefresh(baseAgg, delta, Seq("k"), "op", Seq("v"))
      .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
    val finalRows = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("b", null), ("b", null), ("b", 5.0), ("c", null))
      .toDF("k", "v")
    val rebuilt = Cdc.aggSnapshot(finalRows, Seq("k"), Seq("v"))
      .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
    assert(refreshed == rebuilt, s"NULL refresh drifted:\n$refreshed\nvs\n$rebuilt")
    val viewed = Cdc.aggView(
      Cdc.incrementalAggRefresh(baseAgg, delta, Seq("k"), "op", Seq("v")), Seq("v"))
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2)))).toSeq
    assert(viewed == Seq(
      ("a", 1L, Some(1.0)), ("b", 3L, Some(5.0)), ("c", 1L, None)),
      s"aggView NULL presentation wrong: $viewed")
  }

  test("refresh/view reject a snapshot whose units don't match") {
    val base = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val delta = Seq(("a", 3.0, 1)).toDF("k", "v", "op")
    // scale stamped at snapshot time != scale passed to refresh/view
    val snap4 = Cdc.aggSnapshot(base, Seq("k"), Seq("v"), scale = 4)
    val e1 = intercept[IllegalArgumentException](
      Cdc.incrementalAggRefresh(snap4, delta, Seq("k"), "op", Seq("v"), scale = 2))
    assert(e1.getMessage.contains("scale=4"))
    val e2 = intercept[IllegalArgumentException](Cdc.aggView(snap4, Seq("v"), scale = 2))
    assert(e2.getMessage.contains("scale=4"))
    // a double-typed snapshot (the pre-fixed-point layout) is refused
    // outright instead of silently type-coercing into wrong sums
    val doubleSnap = base.groupBy("k")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum("v").as("sum_v"))
    val e3 = intercept[IllegalArgumentException](
      Cdc.incrementalAggRefresh(doubleSnap, delta, Seq("k"), "op", Seq("v")))
    assert(e3.getMessage.contains("LONG"))
  }

  test("scale stamp survives refresh chaining and a parquet round-trip") {
    val base = Seq(("a", 1.0)).toDF("k", "v")
    val delta = Seq(("a", 3.0, 1)).toDF("k", "v", "op")
    val snap = Cdc.aggSnapshot(base, Seq("k"), Seq("v"), scale = 3)
    val once = Cdc.incrementalAggRefresh(snap, delta, Seq("k"), "op", Seq("v"), scale = 3)
    // chained refresh re-checks the stamp the previous refresh re-stamped
    val twice = Cdc.incrementalAggRefresh(once, delta, Seq("k"), "op", Seq("v"), scale = 3)
    assert(twice.as[(String, Long, Long, Long)].collect().toSeq == Seq(("a", 3L, 7000L, 3L)))
    // and a persisted snapshot keeps its units across the parquet boundary
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-snap").toString
    try {
      once.write.mode("overwrite").parquet(dir)
      val reloaded = spark.read.parquet(dir)
      val e = intercept[IllegalArgumentException](
        Cdc.incrementalAggRefresh(reloaded, delta, Seq("k"), "op", Seq("v"), scale = 2))
      assert(e.getMessage.contains("scale=3"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("append-only refresh == rebuild exactly, including min/max") {
    val base = Seq(("a", 5.0), ("a", 2.0), ("b", 7.5)).toDF("k", "v")
    val snap = Cdc.aggSnapshotMinMax(base, Seq("k"), Seq("v"))
    // delta: plain new rows — a new min for a, a new key c
    val delta = Seq(("a", 1.25), ("a", 9.0), ("c", 3.0)).toDF("k", "v")
    val refreshed = Cdc.incrementalAggRefreshAppendOnly(snap, delta, Seq("k"), Seq("v"))
      .orderBy("k").as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    val rebuilt = Cdc.aggSnapshotMinMax(base.unionByName(delta), Seq("k"), Seq("v"))
      .orderBy("k").as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(refreshed == rebuilt, s"append-only refresh drifted:\n$refreshed\nvs\n$rebuilt")
    // spot-check the semantics: a's min dropped, b untouched, c appeared
    assert(refreshed == Seq(
      ("a", 4L, 1725L, 4L, 1.25, 9.0), ("b", 1L, 750L, 1L, 7.5, 7.5),
      ("c", 1L, 300L, 1L, 3.0, 3.0)))
    // and a mismatched scale still fails loudly through the same guard
    intercept[IllegalArgumentException](
      Cdc.incrementalAggRefreshAppendOnly(snap, delta, Seq("k"), Seq("v"), scale = 3))
  }

  test("append-only refresh maintains KMV sketch columns: refresh == rebuild, arrays exact") {
    val base = (0 until 500).map(i => ("a", 1.0, s"u${i % 120}")) ++
      (0 until 300).map(i => ("b", 2.0, s"v${i % 40}"))
    val delta = (0 until 400).map(i => ("a", 3.0, s"u${100 + (i % 150)}")) ++
      (0 until 50).map(i => ("c", 4.0, s"w$i"))
    val snap = Cdc.aggSnapshotMinMax(base.toDF("k", "m", "u"), Seq("k"), Seq("m"),
      distinctCols = Seq("u"))
    val refreshed = Cdc.incrementalAggRefreshAppendOnly(snap,
        delta.toDF("k", "m", "u"), Seq("k"), Seq("m"), distinctCols = Seq("u"))
      .orderBy("k").select("k", "kmv_u")
      .as[(String, Array[Long])].collect().toSeq
    val rebuilt = Cdc.aggSnapshotMinMax((base ++ delta).toDF("k", "m", "u"),
        Seq("k"), Seq("m"), distinctCols = Seq("u"))
      .orderBy("k").select("k", "kmv_u")
      .as[(String, Array[Long])].collect().toSeq
    assert(refreshed.map(_._1) == rebuilt.map(_._1))
    refreshed.zip(rebuilt).foreach { case ((k1, a), (_, b)) =>
      assert(a.toSeq == b.toSeq, s"kmv sketch for $k1 diverged from rebuild")
    }
    // below-k groups estimate EXACT distinct counts through the sketch
    val ests = Cdc.incrementalAggRefreshAppendOnly(snap,
        delta.toDF("k", "m", "u"), Seq("k"), Seq("m"), distinctCols = Seq("u"))
      .select(col("k"), graft.ops.Sketches.kmvEstimate(col("kmv_u"), 64).as("est"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    assert(ests.find(_._1 == "b").get._2 == 40L)
    assert(ests.find(_._1 == "c").get._2 == 50L)
    // a snapshot built WITHOUT the sketch is refused loudly
    val noKmv = Cdc.aggSnapshotMinMax(base.toDF("k", "m", "u"), Seq("k"), Seq("m"))
    val e = intercept[IllegalArgumentException](
      Cdc.incrementalAggRefreshAppendOnly(noKmv, delta.toDF("k", "m", "u"),
        Seq("k"), Seq("m"), distinctCols = Seq("u")))
    assert(e.getMessage.contains("kmv_u"))
  }

  test("append-only refresh maintains HLL sketch columns: estimates == rebuild exactly") {
    import org.apache.spark.sql.functions.{hll_sketch_estimate, col => c}
    val base = (0 until 2000).map(i => ("a", 1.0, s"u${i % 800}")) ++
      (0 until 500).map(i => ("b", 2.0, s"v$i"))
    val delta = (0 until 1500).map(i => ("a", 3.0, s"u${500 + (i % 900)}")) ++
      (0 until 100).map(i => ("c", 4.0, s"w$i"))
    def estimates(df: org.apache.spark.sql.DataFrame) =
      df.select(c("k"), hll_sketch_estimate(c("hll_u")).as("est"))
        .orderBy("k").as[(String, Long)].collect().toSeq
    val snap = Cdc.aggSnapshotMinMax(base.toDF("k", "m", "u"), Seq("k"), Seq("m"),
      hllCols = Seq("u"))
    val refreshed = Cdc.incrementalAggRefreshAppendOnly(snap,
      delta.toDF("k", "m", "u"), Seq("k"), Seq("m"), hllCols = Seq("u"))
    val rebuilt = Cdc.aggSnapshotMinMax((base ++ delta).toDF("k", "m", "u"),
      Seq("k"), Seq("m"), hllCols = Seq("u"))
    // register-max union is exact: refresh == rebuild in ESTIMATE (the
    // r5 hllRollup contract; serialized bytes may differ by build mode)
    assert(estimates(refreshed) == estimates(rebuilt))
    // keys present on only one side keep their sketch (b untouched by
    // the delta, c delta-only); estimates land within the lgK=12 band
    val m = estimates(refreshed).toMap
    assert(math.abs(m("b") - 500L) <= 10 && math.abs(m("c") - 100L) <= 3,
      s"one-sided sketches off: $m")
    // snapshot built without the sketch is refused loudly
    val noHll = Cdc.aggSnapshotMinMax(base.toDF("k", "m", "u"), Seq("k"), Seq("m"))
    val e = intercept[IllegalArgumentException](
      Cdc.incrementalAggRefreshAppendOnly(noHll, delta.toDF("k", "m", "u"),
        Seq("k"), Seq("m"), hllCols = Seq("u")))
    assert(e.getMessage.contains("hll_u"))
  }

  test("scd2Build: validity intervals chain per key; latest version is current") {
    val changes = Seq(
      (1L, "2024-01-01", "bronze"),
      (1L, "2024-03-01", "silver"),
      (1L, "2024-06-01", "gold"),
      (2L, "2024-02-01", "bronze")
    ).toDF("k", "ts", "tier")
    val got = Cdc.scd2Build(changes, Seq("k"), Seq("ts"))
      .orderBy("k", "ts")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "2024-01-01", "bronze", Some("2024-03-01"), false),
      (1L, "2024-03-01", "silver", Some("2024-06-01"), false),
      (1L, "2024-06-01", "gold", None, true),
      (2L, "2024-02-01", "bronze", None, true)))
  }

  test("scd2Apply == full rebuild; untouched keys pass through; change keys broadcast") {
    val initial = Seq(
      (1L, "2024-01-01", "bronze"), (1L, "2024-03-01", "silver"),
      (2L, "2024-02-01", "bronze"), (3L, "2024-04-01", "gold")
    ).toDF("k", "ts", "tier")
    val dim = Cdc.scd2Build(initial, Seq("k"), Seq("ts"))
    // touch keys 1 (new version: closes the current 'silver') and 9 (new key);
    // a backdated change for key 2 must re-thread that key's history too
    val batch = Seq(
      (1L, "2024-08-01", "gold"),
      (2L, "2024-01-15", "trial"),
      (9L, "2024-07-01", "bronze")
    ).toDF("k", "ts", "tier")
    val applied = Cdc.scd2Apply(dim, batch, Seq("k"), Seq("ts"))
      .orderBy("k", "ts")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSeq
    val rebuilt = Cdc.scd2Build(initial.unionByName(batch), Seq("k"), Seq("ts"))
      .orderBy("k", "ts")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSeq
    assert(applied == rebuilt, s"incremental apply diverged:\n$applied\nvs\n$rebuilt")
    // backdated insert correctly became key 2's FIRST version, closed by the old one
    assert(applied.contains((2L, "2024-01-15", "trial", Some("2024-02-01"), false)))
    // plan: the change-key set reaches the dimension via broadcast joins
    val plan = Cdc.scd2Apply(dim, batch, Seq("k"), Seq("ts"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"change keys not broadcast:\n$plan")
  }

  test("snapshot side is not shuffled: anti-join broadcasts the change keys") {
    val changes = Seq((2L, "b2", 21.0, 1L, false)).toDF("k", "v", "x", "seq", "del")
    val plan = Cdc.mergeUpsert(target, changes, Seq("k"), "seq", "del")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join, got:\n$plan")
  }

  test("pointInTimeJoin: each fact row sees the version current at its own ts") {
    // customer 1 has versions at day 10 (v1) and day 20 (v2); customer 2
    // one version at day 15
    val dim = Cdc.scd2Build(
      Seq((1L, "v1", 10), (1L, "v2", 20), (2L, "w1", 15))
        .toDF("k", "ver", "valid_from"),
      Seq("k"), Seq("valid_from")).drop("is_current")
    val fact = Seq(
      (1L, 100L, 5),   // before the first version: dropped
      (1L, 101L, 10),  // exactly at v1's start: v1
      (1L, 102L, 19),  // inside [10, 20): v1
      (1L, 103L, 20),  // v2's start: v2 (valid_to NULL)
      (1L, 104L, 99),  // far future: v2
      (2L, 105L, 16),  // w1
      (3L, 106L, 16))  // no dimension key: dropped
      .toDF("k", "fact_id", "ts")
    val got = Cdc.pointInTimeJoin(fact, dim, Seq("k"), "ts", "valid_from")
      .select("fact_id", "ver").orderBy("fact_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((101L, "v1"), (102L, "v1"), (103L, "v2"),
      (104L, "v2"), (105L, "w1")), s"PIT semantics wrong: $got")
  }
}
