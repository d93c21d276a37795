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
