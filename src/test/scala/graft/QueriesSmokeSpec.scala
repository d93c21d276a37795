package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** Every registered query must run and return rows at sf0.001 (full
  * value-correctness is the driver's DuckDB gate; this catches plan-time
  * regressions fast). */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  Registry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      // shared single execution per query (ExecutedSurface) — the same
      // run also feeds PlanInvariantsSpec's structural checks
      val n = ExecutedSurface(q)._1
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("approx_count_distinct within tolerance of exact (Q12 contract)") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables(spark, TestSession.sf0001).lineitem
    val both = li.agg(
      countDistinct("l_orderkey").as("exact"),
      approx_count_distinct("l_orderkey", 0.02).as("approx")).collect().head
    val (exact, approx) = (both.getLong(0), both.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = Registry.queries.keySet
    val os = Registry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
  }
}
