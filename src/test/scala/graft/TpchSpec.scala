package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** Plan-quality assertions for the TPC-H-shaped composite queries —
  * these encode the 100 TB contract (dims broadcast, top-k never a full
  * sort, filters reaching the scan), not just row correctness (the
  * DuckDB oracle covers that). */
class TpchSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def plan(name: String): String =
    Registry.byName(name).run(spark, TestSession.sf0001)
      .queryExecution.executedPlan.toString

  test("tpch_q5: all four dims broadcast — only the fact join shuffles") {
    val p = plan("tpch_q5")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts in:\n$p")
    assert(!p.contains("NestedLoop"), "unexpected nested-loop join")
  }

  test("tpch_q3/q10/q18: top-N plans as TakeOrderedAndProject, not a global sort") {
    for (n <- Seq("tpch_q3", "tpch_q10", "tpch_q18")) {
      val p = plan(n)
      assert(p.contains("TakeOrderedAndProject"), s"$n missing TakeOrderedAndProject:\n$p")
    }
  }

  test("tpch_q6: every predicate pushes into the parquet scan") {
    val p = plan("tpch_q6")
    assert(p.contains("PushedFilters: ["), s"no pushed filters:\n$p")
    // the scan must not read columns the query never touches
    assert(!p.contains("l_orderkey"), s"scan reads unprojected columns:\n$p")
  }

  test("tpch_q1: scan reads only the 7 touched lineitem columns") {
    val p = plan("tpch_q1")
    assert(p.contains("PushedFilters: ["), s"shipdate filter not pushed:\n$p")
    assert(!p.contains("l_orderkey") && !p.contains("l_partkey"),
      s"scan reads unprojected columns:\n$p")
  }

  test("tpch_q4: EXISTS plans as a semi join, not an aggregate-then-join") {
    val p = plan("tpch_q4")
    assert(p.contains("LeftSemi"), s"expected a left-semi join:\n$p")
  }

  test("tpch_q8/q14/q19: part and all dims broadcast — no dim shuffle") {
    for ((n, minB) <- Seq(("tpch_q8", 4), ("tpch_q14", 1), ("tpch_q19", 1))) {
      val p = plan(n)
      val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
      assert(broadcasts >= minB, s"$n: expected >=$minB broadcast joins, got $broadcasts:\n$p")
    }
  }

  test("tpch_q15: max is a window over the aggregated rev table, evaluated once") {
    val df = Registry.byName("tpch_q15").run(spark, TestSession.sf0001)
    val p = df.queryExecution.executedPlan.toString
    // One lineitem scan only: a scalar-subquery formulation would scan +
    // aggregate the fact twice; the window formulation reuses one pass.
    val factScans = "lineitem".r.findAllIn(p).length
    assert(factScans <= 2, s"rev table evaluated more than once:\n$p")
  }

  test("tpch_q22: scalar avg is uncorrelated (no per-row rescan), NOT EXISTS is anti join") {
    val p = plan("tpch_q22")
    assert(p.contains("LeftAnti"), s"expected a left-anti join:\n$p")
    val custScans = "customer".r.findAllIn(plan("tpch_q22")).length
    assert(custScans <= 4, s"customer scanned per-row:\n$p")
  }

  test("tpch_q12: lateness rides the fact join; no extra shuffle beyond it") {
    val p = plan("tpch_q12")
    // the o/l join carries the l_shipdate > o_orderdate residual — it
    // must not degrade to a nested loop
    assert(!p.contains("NestedLoop"), s"lateness residual broke the equi-join:\n$p")
    // assert a CONCRETE pushed predicate — every scan prints
    // "PushedFilters: [", even empty, so bare presence can't fail
    assert(p.contains("GreaterThanOrEqual(l_shipdate")
      || p.contains("GreaterThan(l_shipdate"),
      s"year filter not pushed into the lineitem scan:\n$p")
  }

  test("tpch_q13: LEFT join keeps zero-order customers through both aggregations") {
    val p = plan("tpch_q13")
    assert(p.contains("LeftOuter"), s"expected a left-outer join:\n$p")
  }

  test("tpch_q17: part filter and per-part threshold both broadcast") {
    val p = plan("tpch_q17")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, got $broadcasts:\n$p")
    assert(!p.contains("NestedLoop"), "threshold join degraded to nested loop")
  }

  test("tpch_q21: window counts run over the (order, supplier) aggregate, dims broadcast") {
    val df = Registry.byName("tpch_q21").run(spark, TestSession.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), s"per-order counts should be a window:\n$p")
    // supplier + nation broadcast after the filter
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, got $broadcasts:\n$p")
  }

  test("tpch_q2: per-part min is a window over the derived ps aggregate, dims broadcast") {
    val p = plan("tpch_q2")
    assert(p.contains("Window"), s"per-part min should be a window:\n$p")
    assert(!p.contains("NestedLoop"), "correlated min degraded to nested loop")
  }

  test("tpch_q9/q16/q20: dims broadcast; Q16 exclusion is an anti join; Q20 probe is semi") {
    val p9 = plan("tpch_q9")
    assert("BroadcastHashJoin".r.findAllIn(p9).length >= 3,
      s"q9 dims should broadcast:\n$p9")
    val p16 = plan("tpch_q16")
    assert(p16.contains("LeftAnti"), s"q16 exclusion should be an anti join:\n$p16")
    val p20 = plan("tpch_q20")
    assert(p20.contains("LeftSemi"), s"q20 probe should be a semi join:\n$p20")
  }

  test("tpch_q18: lineitem pre-aggregates before joining orders") {
    val df = Registry.byName("tpch_q18").run(spark, TestSession.sf0001)
    val p = df.queryExecution.optimizedPlan.toString
    // Aggregate must sit below the joins in the optimized plan: the join
    // input is |orders over threshold|, not |lineitem|.
    val aggIdx = p.indexOf("Aggregate")
    val joinIdx = p.indexOf("Join")
    assert(aggIdx > joinIdx && joinIdx >= 0,
      s"aggregate should be a join child (deeper in the tree):\n$p")
  }
}
