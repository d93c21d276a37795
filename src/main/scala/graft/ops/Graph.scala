package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

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
    * Scale shape (round 14, optimization guide §2.4 "remove shuffles
    * outright"): symmetrize+dedup runs as one SQL distinct (UnsafeRow
    * exchange), then the loop runs on co-partitioned RDDs under one
    * shared HashPartitioner — the degree-annotated edge list is
    * shuffled ONCE and persisted, and every round's edge⋈rank join is
    * a narrow `zipPartitions` against a primitive-keyed hash map of
    * the co-partitioned rank partition (measured ~6× cheaper per round
    * than the generic cogroup join, which funnels every edge through
    * an ExternalAppendOnlyMap). Each round pays exactly one |V|-scale
    * shuffle: the map-side-combined contribution sum (`reduceByKey`) —
    * the floor any edge-cut PageRank must pay. The whole recurrence is
    * ONE job (shuffle files bound each round's lineage), replacing the
    * previous per-round eager DataFrame loop whose 10 jobs re-paid
    * Catalyst analysis, per-round SMJ sorts and block-manager churn
    * every iteration. The partitioner width derives from the
    * symmetrized edge list's own (AQE-coalesced) partitioning, so it
    * scales with data, not with a constant. Per-round arithmetic is
    * unchanged (contribution = rank/deg per edge, rank = (1−d)/N +
    * d·Σ, partial sums per partition then merged), so ranks agree with
    * the unrolled SQL oracle at the compare's 6 significant digits
    * exactly as before.
    *
    * `broadcastRanks` broadcasts the |V|-entry rank map into every
    * round instead of shuffling ranks — wins only when the rank fetch
    * dominates; costs a per-round driver collect, so the default stays
    * the co-partitioned narrow join.
    *
    * `reliable` checkpoints every round's rank vector durably
    * ([[Checkpoints]] semantics — set
    * `spark.sparkContext.setCheckpointDir` first): identical ranks
    * (same partitioning, same per-round arithmetic — only where state
    * is materialized changes), but iteration state survives executor
    * loss at the cost of one job + checkpoint write per round — the
    * right call for hours-long cluster runs where a lost executor
    * would otherwise abort the whole recurrence.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, damping: Double = 0.85,
               broadcastRanks: Boolean = false,
               reliable: Boolean = false): DataFrame = {
    require(iters >= 0, "Graph.pageRank: negative iteration count")
    val spark = edges.sparkSession
    val sc = spark.sparkContext

    // symmetrize + dedup in SQL: the one full-edge-list distinct runs
    // on UnsafeRow exchanges (cheaper than an RDD tuple shuffle)
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val symDf = fwd
      .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val symRdd = symDf.rdd.map(r => (r.getLong(0), r.getLong(1)))
    // partitioner width follows the distinct's AQE-coalesced output —
    // proportional to |E|, adaptive to the session's parallelism
    val parts = math.max(symRdd.getNumPartitions, 1)
    val part = new HashPartitioner(parts)

    val symP = symRdd.partitionBy(part) // the ONE edge-list shuffle
    // degree per src: narrow — already partitioned by src
    val deg: RDD[(Long, Long)] =
      symP.mapValues(_ => 1L).reduceByKey(part, _ + _)
    // src -> (dst, deg(src)): narrow zip of two co-partitioned RDDs
    val es: RDD[(Long, (Long, Long))] = symP
      .zipPartitions(deg, preservesPartitioning = true) { (eIt, dIt) =>
        val m = new scala.collection.mutable.LongMap[Long]()
        dIt.foreach { case (k, v) => m(k) = v }
        eIt.map { case (s, d) => (s, (d, m(s))) }
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    val n = deg.count()
    require(n > 0, "Graph.pageRank: empty graph")
    val base = (1.0 - damping) / n

    var ranks: RDD[(Long, Double)] = deg.mapValues(_ => 1.0 / n)
    // broadcastRanks mode: each round's |V|-entry broadcast is destroyed
    // once the next round's ranks are materialized (it is consumed inside
    // the same recurrence), and the try/finally guarantees the persisted
    // edge blocks are released even when a round throws (e.g.
    // reliable=true without a checkpoint dir) — without these, an
    // exception mid-loop leaks every round's broadcast and the edge
    // blocks until context GC.
    var prevBc: org.apache.spark.broadcast.Broadcast[_] = null
    val out = try {
      var it = 0
      while (it < iters) {
        val contribs: RDD[(Long, Double)] =
          if (broadcastRanks) {
            val rmap = sc.broadcast(ranks.collectAsMap())
            // the collect above executed the previous round's shuffle,
            // so its broadcast's last planned read is done — destroy it
            // now instead of pinning O(rounds) |V|-entry broadcasts
            // (only a shuffle-file loss could re-demand it; acceptable
            // for this flag-gated mode)
            if (prevBc != null) prevBc.destroy()
            prevBc = rmap
            es.mapPartitions(p => p.flatMap { case (s, (d, dg)) =>
              rmap.value.get(s) match {
                case Some(r) => Iterator.single((d, r / dg))
                case None => Iterator.empty
              }
            })
          } else {
            // narrow hash join: es and ranks share `part`; every src has
            // a rank (the rank vector covers all nodes), so the map
            // lookup is total
            es.zipPartitions(ranks, preservesPartitioning = false) { (eIt, rIt) =>
              val m = new scala.collection.mutable.LongMap[Double]()
              rIt.foreach { case (k, v) => m(k) = v }
              eIt.map { case (s, (d, dg)) => (d, m(s) / dg) }
            }
          }
        val next = contribs
          .reduceByKey(part, _ + _) // map-side combined: |V|-scale shuffle
          .mapValues(s => base + damping * s)
        if (reliable) { next.checkpoint(); next.count() }
        ranks = next
        it += 1
      }

      // one eager job materializes the whole recurrence, then the edge
      // blocks are released — the returned rank vector is self-contained
      val res = ranks.persist(StorageLevel.MEMORY_AND_DISK)
      res.count()
      // success: the FINAL round's broadcast must stay alive — a later
      // eviction/executor loss recomputes res's last map stage through
      // it, and a destroyed broadcast fails that recompute instead of
      // degrading. One leaked broadcast goes to the ContextCleaner (the
      // pre-r15 behavior for all of them); only the O(rounds) pile-up
      // and the exception path destroy eagerly.
      prevBc = null
      res
    } finally {
      if (prevBc != null) prevBc.destroy()
      es.unpersist(blocking = false)
    }
    val schema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("rank", DoubleType, nullable = false)))
    spark.createDataFrame(out.map { case (v, r) => Row(v, r) }, schema)
  }
}
