package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Graph
import graft.sources.Tables

/** Graph analytics over the customer–supplier interaction graph
  * (distinct trade edges from lineitem ⋈ orders; node ids namespaced
  * as 2·custkey / 2·suppkey+1). */
object GraphQueries {

  /** One unrolled PageRank round in SQL: rₜ₊₁ = (1−d)/N + d·Σ rₜ/deg.
    * All constants forced to DOUBLE so DuckDB performs the same IEEE
    * ops as the JVM ((1.0−0.85) ≠ decimal 0.15 in the last ulp). */
  private def prStep(prev: String, t: String): String =
    s"""r$t AS (SELECT e.dst AS node,
       |          (1.0::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
       |            + 0.85::DOUBLE * sum(r.rank / e.deg) AS rank
       |        FROM e JOIN $prev r ON e.src = r.node GROUP BY e.dst)""".stripMargin

  // 10 fixed PageRank iterations on the symmetrized trade graph —
  // fixed-iteration (not convergence-tested) so the unrolled SQL CTE
  // chain replays it exactly; double sums agree at the compare's 6
  // significant digits.
  private val pagerank = QueryDef("gr_pagerank", Some {
    val steps = (1 to 10).map(t => prStep(s"r${t - 1}", t.toString)).mkString(",\n")
    s"""WITH f AS (SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
       |           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |sym AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),
       |dg AS (SELECT src, count(*)::BIGINT AS deg FROM sym GROUP BY 1),
       |e AS (SELECT sym.src, sym.dst, dg.deg FROM sym JOIN dg USING (src)),
       |nn AS (SELECT count(*)::BIGINT AS n FROM dg),
       |r0 AS (SELECT src AS node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM dg),
       |$steps
       |SELECT node, rank FROM r10""".stripMargin
  }) { (spark, dir) =>
    val t = Tables(spark, dir)
    val li = t.lineitem.select("l_orderkey", "l_suppkey")
    val o = t.orders.select("o_orderkey", "o_custkey")
    val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    // no .distinct() here: pageRank's symmetrize+dedup subsumes it
    // (identical graph, one less full-edge shuffle — guide §2.4)
    Graph.pageRank(edges, "src", "dst", iters = 10)
  }

  val defs: Seq[QueryDef] = Seq(pagerank)
}
