package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge tables (the second graph
  * operator family next to [[Dedup.connectedComponents]]): PageRank
  * for ranking entities in link/interaction graphs — domain authority
  * in a web-corpus curation pipeline, account importance in an
  * interaction graph.
  */
object Graph {

  /** Fixed-iteration PageRank over an undirected graph (edges are
    * symmetrized and de-duplicated; every node therefore has degree
    * ≥ 1, so there are no dangling nodes and total rank is conserved):
    *
    *   r₀(v)   = 1/N
    *   rₜ₊₁(v) = (1−d)/N + d · Σ_{u~v} rₜ(u) / deg(u)
    *
    * Fixed `iters` (not convergence-tested) keeps the operator
    * deterministic and mirrorable by an unrolled SQL oracle.
    *
    * Scale shape: the degree-annotated edge list is materialized once
    * (localCheckpoint — iteration N must not replay 1…N−1) and each
    * round is one hash equi-join of the (|V|-row) rank vector against
    * the edge list plus one map-side-combinable sum — the classic
    * edge-cut PageRank round, linear in |E| per iteration. The rank
    * vector is re-checkpointed each round to truncate lineage (chaining
    * rounds into one job was measured SLOWER — the re-analysis of the
    * deepening self-join plan under AQE costs more than the jobs it
    * saves); nothing collects to the driver.
    *
    * `broadcastRanks` broadcasts the |V|-row rank vector into the join
    * so the |E|-row edge list is never shuffled per round. Measured at
    * local[32] / 1M edges it LOSES (11.5s vs 6.5s median): the edge
    * list's checkpoint partitioning already feeds the join exchange-
    * free, so the broadcast only adds a per-round driver collect +
    * broadcast build. It wins when the edge list CAN'T stay partitioned
    * (multi-tenant clusters re-planning per round) or when |E|/|V| is
    * large enough that even one rank-vector shuffle per round dominates
    * — hence a flag, defaulting to the measured-faster shape.
    *
    * `reliable` switches the per-round materialization from
    * executor-local blocks to durable checkpoints
    * ([[Checkpoints]] — set `spark.sparkContext.setCheckpointDir`
    * first): identical ranks, but iteration state survives executor
    * loss — the right call for hours-long cluster runs where the
    * local default would abort the whole job on one lost executor.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, damping: Double = 0.85,
               broadcastRanks: Boolean = false,
               reliable: Boolean = false): DataFrame = {
    require(iters >= 0, "Graph.pageRank: negative iteration count")
    def ckpt(df: DataFrame): DataFrame = Checkpoints.materialize(df, reliable)
    def release(df: DataFrame): Unit = Checkpoints.release(df, reliable)
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val es = ckpt(sym.join(deg, "src")) // one materialization
    val n = deg.count()
    require(n > 0, "Graph.pageRank: empty graph")
    val base = (1.0 - damping) / n
    var ranks = ckpt(
      deg.select(col("src").as("node"), lit(1.0 / n).as("rank")))
    var it = 0
    while (it < iters) {
      val r = if (broadcastRanks) broadcast(ranks) else ranks
      val next = ckpt(es.join(r, es("src") === r("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node")
        .agg((lit(base) + lit(damping) * sum("c")).as("rank"))
        ) // eager: `next` is fully materialized here
      // release the superseded round's blocks NOW instead of waiting for
      // the ContextCleaner: otherwise every round pins another |V|-row
      // block set and a multi-sample bench accumulates iters× that —
      // measured as the 11s→58s dispersion escalation in BENCH_r04.
      release(ranks)
      ranks = next
      it += 1
    }
    // the edge materialization served its iters joins; the returned rank
    // vector is self-contained (lineage-truncated, own blocks)
    release(es)
    ranks
  }
}
