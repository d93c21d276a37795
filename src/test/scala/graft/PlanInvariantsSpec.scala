package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** Engine-wide physical-plan invariants over EVERY registered query —
  * the structural half of the 100 TB contract (the oracle checks the
  * values). A change that silently turns a bucketed join into a
  * nested-loop or drops a pushed filter fails here, not in a profiler
  * three rounds later.
  *
  * Plans are inspected AFTER one execution: under AQE the pre-execution
  * plan is a placeholder (`isFinalPlan=false`, no codegen annotation),
  * so only the finalized plan tells the truth about join strategies and
  * codegen spans. */
class PlanInvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Queries DECLARED to plan a nested-loop/cartesian join:
    *  - q_cross_join: the capability probe itself, bounded at 100 rows;
    *  - q_subq_scalar / q_subq_not_exists / e3_nb_classifier / txt_tfidf
    *    / txt_bm25 / txt_bm25_batch / tpch_q11 / tpch_q22: scalar
    *    subqueries (corpus totals, vocab size, the Q11 value threshold,
    *    the Q22 average balance, BM25's (N, avgdl) pair — identical in
    *    the batch form, computed once for all queries) — Spark plans
    *    the 1-row aggregate as a broadcast NLJ build side, constant
    *    cost;
    *  - e2_knn_brute: the DECLARED design broadcasts the tiny query set
    *    against one corpus scan — a BroadcastNestedLoopJoin whose inner
    *    side is k queries, linear in the corpus by construction;
    *  - e2_pq_topk: same declared shape — the per-query ADC tables
    *    (|queries|·m·k doubles) broadcast against one pass over the
    *    m-ints-per-vector encoded corpus. */
  private val nestedLoopAllowed = Set("q_cross_join", "q_subq_scalar",
    "q_subq_not_exists", "e3_nb_classifier", "txt_tfidf", "txt_bm25",
    "txt_bm25_batch", "e2_knn_brute", "tpch_q11", "tpch_q22", "e2_pq_topk")

  private lazy val plans: Map[String, String] =
    // one shared execution per query (ExecutedSurface) — the same run
    // also feeds QueriesSmokeSpec's row counts; the plan string is the
    // AQE-final executed plan (see ExecutedSurface for why collect())
    Registry.all.map(q => q.name -> ExecutedSurface(q)._2).toMap

  test("no undeclared nested-loop or cartesian joins anywhere in the surface") {
    val offenders = plans.collect {
      case (name, p) if (p.contains("NestedLoop") || p.contains("CartesianProduct"))
        && !nestedLoopAllowed(name) => name
    }
    assert(offenders.isEmpty, s"undeclared quadratic joins in: $offenders")
  }

  test("every lineitem scan prunes columns (no full-schema scans of the widest table)") {
    // lineitem has 11 columns; a scan reading all of them for a query
    // that projects a few is the classic pushdown regression.
    // q1_project reads 8 of 11 on purpose; q_salted_join replicates
    // whole rows by design.
    val offenders = plans.collect {
      case (name, p) if p.contains("ReadSchema") &&
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
          "l_shipdate").forall(p.contains) &&
        !Set("q1_project", "q_salted_join").contains(name) => name
    }
    assert(offenders.isEmpty, s"full-width lineitem scans in: $offenders")
  }

  test("whole-stage codegen covers every batch query's hot path") {
    val offenders = plans.collect {
      case (name, p) if !p.contains("WholeStageCodegen") && !p.contains("*(") => name
    }
    assert(offenders.isEmpty, s"no codegen span at all in: $offenders")
  }

  test("e2 similarity scoring runs the native cosine INSIDE a codegen span") {
    // The whole point of CosineSimilarityF is staying in whole-stage
    // codegen on the corpus × queries hot path; a silent fallback to
    // interpreted eval (e.g. an expression change breaking doGenCode)
    // would be a multi-x regression the oracle can't see. Assert the
    // executed plan evaluates cosine_f in a `*(n)` codegen'd node.
    for (name <- Seq("e2_knn_brute", "e2_ann_topk", "e2_ivf_topk")) {
      val p = plans(name)
      assert(p.contains("cosine_f"), s"$name no longer scores with cosine_f:\n$p")
      val inCodegen = p.linesIterator.exists(l => l.contains("cosine_f") && l.contains("*("))
      assert(inCodegen, s"$name evaluates cosine_f OUTSIDE codegen (interpreted fallback):\n$p")
    }
  }

  test("q_outliers: the fence aggregate is BROADCAST back (no second fact shuffle)") {
    // The two-pass IQR gate's whole design is that the per-group fence
    // table (|groups| rows) broadcasts onto the fact table, so the fact
    // shuffles once (for the percentile) and never again for the
    // counting pass. A refactor dropping the broadcast() hint would
    // silently re-shuffle the full fact per query — fine at sf0.1,
    // dead at 100 TB. Pin the shape like the knn broadcast assertion.
    val p = plans("q_outliers")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"q_outliers fences are no longer broadcast:\n$p")
    // the AQE printout repeats the tree under "== Initial Plan ==" —
    // count exchanges only in the final section
    val finalPlan = p.split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(shuffles <= 2,
      s"q_outliers shuffles the fact more than its declared passes:\n$p")
  }

  test("e2_knn_brute: the declared linear scan broadcasts its QUERY side") {
    // The one intentionally O(|corpus|·|queries|) operator in the
    // surface. Its contract: the tiny query set is the broadcast build
    // side of a BroadcastNestedLoopJoin and the corpus streams once.
    // Assert the shape (not just allowlist it) so a future change can't
    // silently flip it into a shuffled NLJ or cartesian that would
    // shuffle the corpus — the difference between "linear in corpus"
    // and "dead at 100 TB".
    val p = plans("e2_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"e2_knn_brute lost its broadcast NLJ shape:\n$p")
    assert(p.contains("BuildRight"),
      s"e2_knn_brute no longer builds (broadcasts) the query side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"e2_knn_brute degenerated into a shuffled cartesian:\n$p")
  }
}
