package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2.6 E2).
  *
  * - [[cosine]]: pure-builtin (zip_with + aggregate) double-precision
  *   cosine — codegen'd, no UDF.
  * - [[bruteForceTopK]]: exact top-k — broadcast the (small) query set,
  *   stream the corpus once, per-query top-k via window. The baseline.
  * - [[annTopK]]: random-hyperplane LSH buckets — the scale path: the
  *   corpus is scanned once to bucket signatures, and candidates are
  *   only same-bucket rows (a hash-partitioned equi-join, never a full
  *   cross product). Recall is probabilistic (tested vs brute force).
  */
object Similarity {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Cosine via builtin higher-order functions (zip_with + aggregate).
    * Numerically identical to [[cosine]] but interpreted (Spark HOFs
    * don't participate in codegen) — kept as the reference
    * implementation the native expression is tested against. */
  def cosineHof(a: Column, b: Column): Column = {
    val (ad, bd) = (toDouble(a), toDouble(b))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Cosine similarity of two array<float> columns, in double — the
    * native codegen'd expression (single fused loop; ~50× the HOF
    * composition on all-pairs workloads). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineF(a, b)

  /** Exact cosine top-k: for each row of `queries`, the k nearest rows
    * of `corpus` (self-matches on equal ids excluded). Output:
    * query_id, neighbor_id, cos, rk (1-based).
    *
    * Scale shape: one corpus scan against the broadcast query set; the
    * per-query top-k runs through the custom GroupedTopK operator
    * (bounded heaps, map-side partial, k rows per group shuffled) —
    * never a full per-group sort; ranks are then assigned on the tiny
    * k×|queries| result. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val scored = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qe"), col("ne")))
      .select("query_id", "neighbor_id", "cos")
    val top = graft.plans.GroupedTopK(
      scored, Seq("query_id"), k, Seq(("cos", true), ("neighbor_id", false)))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    top.withColumn("rk", row_number().over(w))
      .select("query_id", "neighbor_id", "cos", "rk")
  }

  /** IVF-style approximate top-k (the second scale path, alongside
    * [[annTopK]]): the corpus is clustered into `nCells` cells around
    * deterministic centroids (the `nCells` rows ordered first by
    * `pmod(xxhash64(vec_id), 1000000007)` — a hash-ordered deterministic
    * sample, then Lloyd-refined; see [[trainCentroids]]). Each corpus row
    * joins its single nearest cell; each query probes its `nProbe`
    * nearest cells; candidates come from a hash equi-join on cell id.
    *
    * Scale shape: centroids broadcast twice (assignment + probing), one
    * shuffle on cell id — corpus is never cross-joined. Recall grows
    * with nProbe/nCells (tested vs the exact baseline). */
  /** Deterministic Lloyd-trained IVF centroids: seeds are the `nCells`
    * rows first in `pmod(xxhash64(vec_id), 1000000007)` order (a
    * hash-ordered deterministic sample — TakeOrdered, no global sort),
    * refined by `iters` rounds of assign + mean.
    *
    * Scale shape per round (MLlib KMeans' shape): centroids broadcast,
    * ONE narrow pass over the corpus computing per-partition
    * (cell → sumVec, count) partials in a JVM loop — no shuffle of
    * corpus rows at all; the driver combines partitions × nCells
    * bounded partials (nCells × dim doubles — model state, not data).
    * Cosine assignment ignores vector norms, so cells are trained on
    * the same metric they serve. Empty cells keep their previous
    * centroid. Returns (cell_id, ce: array<float>). */
  def trainCentroids(corpus: DataFrame, nCells: Int, iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val seeds = corpus.orderBy(pmod(xxhash64(col("vec_id")), lit(1000000007L)))
      .limit(nCells)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    require(seeds.nonEmpty, "trainCentroids: empty corpus")
    val dim = seeds(0).length
    val vecs = corpus.select(col("embedding")).as[Array[Float]]
    var centers = seeds
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(centers)
      val partials = vecs.mapPartitions { rows =>
        val cs = bc.value
        val k = cs.length
        // pre-normalized centers: cosine argmax = dot with unit centers
        val unit = cs.map { c =>
          val n = math.sqrt(c.map(x => x * x).sum)
          if (n == 0.0) c else c.map(_ / n)
        }
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Long](k)
        rows.foreach { v =>
          var best = 0; var bestSim = Double.NegativeInfinity
          var c = 0
          while (c < k) {
            var dot = 0.0; var nv = 0.0
            var i = 0
            while (i < dim) { dot += v(i) * unit(c)(i); nv += v(i).toDouble * v(i); i += 1 }
            val sim = if (nv == 0.0) 0.0 else dot / math.sqrt(nv)
            if (sim > bestSim) { bestSim = sim; best = c } // strict > keeps lowest cell on ties
            c += 1
          }
          val s = sums(best)
          var i = 0
          while (i < dim) { s(i) += v(i); i += 1 }
          counts(best) += 1
        }
        Iterator.range(0, k).filter(counts(_) > 0).map(c => (c, sums(c), counts(c)))
      }.collect()
      val nextSums = Array.fill(centers.length)(new Array[Double](dim))
      val nextCounts = new Array[Long](centers.length)
      partials.foreach { case (c, s, n) =>
        var i = 0
        while (i < dim) { nextSums(c)(i) += s(i); i += 1 }
        nextCounts(c) += n
      }
      centers = centers.indices.toArray.map { c =>
        if (nextCounts(c) == 0) centers(c) // empty cell: keep previous centroid
        else nextSums(c).map(_ / nextCounts(c))
      }
      bc.destroy()
      it += 1
    }
    spark.createDataset(centers.toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, c.map(_.toFloat)) })
      .toDF("cell_id", "ce")
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, lloydIters: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = broadcast(trainCentroids(corpus, nCells, lloydIters))
    def scoredCells(df: DataFrame, idAs: String, vecAs: String) = df
      .select(col("vec_id").as(idAs), col("embedding").as(vecAs))
      .join(centroids)
      .withColumn("sim", cosine(col(vecAs), col("ce")))
    // corpus → single nearest cell via max_by (map-side partial agg —
    // a window here would shuffle+sort the corpus×nCells cross product
    // just to pick an argmax). Tiebreak: higher sim, then lower cell_id.
    val cells = scoredCells(corpus, "neighbor_id", "ne")
      .groupBy("neighbor_id")
      .agg(
        max_by(col("cell_id"), struct(col("sim"), -col("cell_id"))).as("cell_id"),
        first(col("ne")).as("ne"))
    // queries → nProbe nearest cells (query set is small; window is fine)
    val w0 = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cell_id"))
    val probes = scoredCells(queries, "query_id", "qe")
      .withColumn("crk", row_number().over(w0))
      .filter(col("crk") <= nProbe)
      .select(col("query_id"), col("qe"), col("cell_id"))
    // each corpus row lives in exactly one cell, so the probe join
    // yields each (query, neighbor) pair at most once — safe to feed
    // straight into the bounded-heap top-k, ranks assigned after on the
    // k×|queries| result (the bruteForceTopK pattern; a row_number
    // window here would fully sort every candidate group)
    val scored = cells.join(probes, "cell_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qe"), col("ne")))
      .select("query_id", "neighbor_id", "cos")
    val top = graft.plans.GroupedTopK(
      scored, Seq("query_id"), k, Seq(("cos", true), ("neighbor_id", false)))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    top.withColumn("rk", row_number().over(w))
      .select("query_id", "neighbor_id", "cos", "rk")
  }

  // ---- Deterministic integer-quantized IVF (oracle-mirrorable) ----------

  /** 32-bit avalanche mix (same chain as [[intPlaneWeights]]): plain
    * `*`, `%`, `xor`, `//` so a SQL oracle reproduces it exactly. */
  private[graft] def mix32(x: Long): Long = {
    var h = (x * 2654435761L) % 4294967296L
    h ^= (h >> 16)
    h = (h * 40503L) % 4294967296L
    h ^ (h >> 13)
  }

  /** Training-side quantization scale 2^10: coarser than [[QuantScale]]
    * on purpose — cell assignment only needs the argmax to be stable,
    * and the smaller magnitudes keep every integer dot product and its
    * double image exact (see [[trainCentroidsQuant]]). */
  private[graft] val IvfQuantScale = 1024L

  private[graft] def quantizeVec(v: Array[Float], dim: Int): Array[Long] = {
    require(v != null && v.length == dim,
      s"ivfQuant: embedding length ${if (v == null) "null" else v.length} != dim=$dim")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      val d = v(i).toDouble
      require(math.abs(d) < MaxAbsInput, s"ivfQuant: |v|=$d exceeds quantization headroom")
      q(i) = math.floor(d * IvfQuantScale).toLong
      i += 1
    }
    q
  }

  /** Cell pick maximizing `dot(q, S_c) / n_c` — the mean-dot metric with
    * the division deferred: the dot is an exact integer (so partials
    * combine associatively) and the single double division is IEEE-
    * identical in the JVM and in SQL. Ties go to the lower cell id. */
  private def bestCellQuant(qv: Array[Long], sums: Array[Array[Long]],
                            counts: Array[Long]): Int = {
    var best = 0; var bestM = Double.NegativeInfinity
    var c = 0
    while (c < sums.length) {
      var d = 0L
      var i = 0
      val s = sums(c)
      while (i < qv.length) { d += qv(i) * s(i); i += 1 }
      val m = d.toDouble / counts(c).toDouble
      if (m > bestM) { bestM = m; best = c } // strict > keeps lowest cell on ties
      c += 1
    }
    best
  }

  /** Deterministic IVF centroid state: seeds are the `nCells` corpus
    * rows first in [[mix32]]`(vec_id+1)` order, refined by `iters`
    * rounds of integer-Lloyd — assignment by the mean-dot metric above,
    * update keeping per-cell (sum-vector, count) in exact integers.
    *
    * Integer sums are associative, so the trained state is IDENTICAL
    * under any partitioning or scheduling order — unlike float-mean
    * Lloyd ([[trainCentroids]]), whose partial-combine order perturbs
    * the low bits. That determinism is what lets a plain-SQL oracle
    * replay training bit-for-bit, and at cluster scale it makes reruns
    * reproduce the same cell layout exactly.
    *
    * Scale shape per round: state broadcast (nCells x dim longs), ONE
    * narrow pass computing per-partition (cell -> sumVec, count)
    * partials — corpus rows never shuffle. Exactness bound: every dot
    * and its double image stay exact while |corpus| < 2^27 rows per the
    * headroom comment on [[IvfQuantScale]] (dot <= N * 2^26 < 2^53). */
  private[graft] def trainCentroidsQuant(corpus: DataFrame, nCells: Int,
      iters: Int, dim: Int): (Array[Array[Long]], Array[Long]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val seeds = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (mix32(id + 1), id, quantizeVec(v, dim)) }
      .toDF("h", "vec_id", "qv")
      .orderBy("h", "vec_id").limit(nCells) // TakeOrdered — no global sort
      .select(col("qv")).as[Array[Long]].collect()
    require(seeds.length == nCells, s"ivfQuant: corpus smaller than nCells=$nCells")
    var sums = seeds
    var counts = Array.fill[Long](nCells)(1L)
    val vecs = corpus.select(col("embedding")).as[Array[Float]]
    var it = 0
    while (it < iters) {
      val bcS = spark.sparkContext.broadcast(sums)
      val bcN = spark.sparkContext.broadcast(counts)
      val partials = vecs.mapPartitions { rows =>
        val (s0, n0) = (bcS.value, bcN.value)
        val acc = Array.fill(nCells)(new Array[Long](dim))
        val cnt = new Array[Long](nCells)
        rows.foreach { v =>
          val qv = quantizeVec(v, dim)
          val c = bestCellQuant(qv, s0, n0)
          val a = acc(c)
          var i = 0
          while (i < dim) { a(i) += qv(i); i += 1 }
          cnt(c) += 1
        }
        Iterator.range(0, nCells).filter(cnt(_) > 0).map(c => (c, acc(c), cnt(c)))
      }.collect()
      val nextS = Array.fill(nCells)(new Array[Long](dim))
      val nextN = new Array[Long](nCells)
      partials.foreach { case (c, s, n) =>
        var i = 0
        while (i < dim) { nextS(c)(i) += s(i); i += 1 }
        nextN(c) += n
      }
      // empty cells keep their previous state
      sums = Array.tabulate(nCells)(c => if (nextN(c) == 0) sums(c) else nextS(c))
      counts = Array.tabulate(nCells)(c => if (nextN(c) == 0) counts(c) else nextN(c))
      bcS.destroy(); bcN.destroy()
      it += 1
    }
    (sums, counts)
  }

  /** Deterministic integer-quantized IVF top-k: same plan shape as
    * [[ivfTopK]] (broadcast cell state, hash equi-join on cell id,
    * exact cosine rescore, bounded-heap top-k) but every training and
    * assignment step is exact integer arithmetic + one IEEE double
    * division — the output is bit-reproducible across runs, cluster
    * layouts, and in a plain-SQL oracle. The float-Lloyd [[ivfTopK]]
    * remains the statistically-nicer variant; this one trades centroid
    * precision (2^10 quantization) for end-to-end determinism. */
  def ivfTopKQuant(queries: DataFrame, corpus: DataFrame, k: Int,
                   nCells: Int = 16, nProbe: Int = 4, iters: Int = 2,
                   dim: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (sums, counts) = trainCentroidsQuant(corpus, nCells, iters, dim)
    val bcS = spark.sparkContext.broadcast(sums)
    val bcN = spark.sparkContext.broadcast(counts)
    // corpus -> single best cell, one narrow pass
    val cells = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id, bestCellQuant(quantizeVec(v, dim), bcS.value, bcN.value).toLong, v)
      }
      .toDF("neighbor_id", "cell_id", "ne")
    // queries -> nProbe best cells each (query set is small)
    val probes = queries.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val qv = quantizeVec(v, dim)
        val (s0, n0) = (bcS.value, bcN.value)
        val ms = Array.tabulate(nCells) { c =>
          var d = 0L
          var i = 0
          while (i < dim) { d += qv(i) * s0(c)(i); i += 1 }
          (d.toDouble / n0(c).toDouble, c.toLong)
        }
        // sort by metric desc, cell asc — identical to the SQL mirror's
        // row_number() ORDER BY m DESC, cell_id
        ms.sortBy { case (m, c) => (-m, c) }.take(nProbe)
          .map { case (_, c) => (id, c, v) }.toSeq
      }
      .toDF("query_id", "cell_id", "qe")
    val scored = cells.join(broadcast(probes), "cell_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qe"), col("ne")))
      .select("query_id", "neighbor_id", "cos")
    val top = graft.plans.GroupedTopK(
      scored, Seq("query_id"), k, Seq(("cos", true), ("neighbor_id", false)))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    top.withColumn("rk", row_number().over(w))
      .select("query_id", "neighbor_id", "cos", "rk")
  }

  // ---- Incremental IVF maintenance --------------------------------------
  //
  // The embedding twin of the LSH index-never-reshuffles pattern
  // (Dedup.nearDupsAgainstIndex): a production IVF index does NOT
  // retrain on every ingest — the trained centroid state is FROZEN,
  // each arriving batch is assigned to cells in one narrow pass under
  // the broadcast state (O(|batch| · nCells · dim) integer work; the
  // existing corpus never reshuffles), and per-cell membership stats
  // (count + exact integer sum-vector) accumulate ASSOCIATIVELY — so
  // ingesting in any batch split equals one-shot ingestion exactly,
  // the law e2_ivf_incremental hash-checks. Per-cell drift
  // (1 − cos(trained centroid, current member mean)) then tells which
  // cells have wandered enough to deserve re-centering; the decision is
  // a pure function of the accumulated stats, so the whole maintenance
  // pipeline is deterministic and replays in a plain-SQL oracle.

  /** Per-cell membership stats of `df`'s embeddings under a FROZEN
    * trained state ([[trainCentroidsQuant]]'s (sums, counts)): one row
    * per non-empty cell — (cell_id, n, sv) with `sv` the exact integer
    * sum of the members' quantized vectors. One narrow pass (state
    * broadcast, rows never shuffle beyond the nCells-row fold). */
  def ivfCellStats(df: DataFrame, sums: Array[Array[Long]],
                   counts: Array[Long], dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bcS = spark.sparkContext.broadcast(sums)
    val bcN = spark.sparkContext.broadcast(counts)
    df.select(col("embedding")).as[Array[Float]]
      .map { v =>
        val qv = quantizeVec(v, dim)
        (bestCellQuant(qv, bcS.value, bcN.value).toLong, qv)
      }
      .toDF("cell_id", "qv")
      .groupBy("cell_id")
      .agg(count(lit(1)).as("n"),
        array((0 until dim).map(i => sum(element_at(col("qv"), i + 1))): _*).as("sv"))
  }

  /** Merge two [[ivfCellStats]] tables — the incremental-refresh fold:
    * counts add, sum-vectors add element-wise (exact integers, so
    * merge order is irrelevant). Full-outer on cell_id: a cell seen by
    * only one side keeps that side's stats. */
  def ivfCellStatsMerge(a: DataFrame, b: DataFrame, dim: Int = 64): DataFrame = {
    val zeros = typedLit(Array.fill(dim)(0L))
    val bb = b.withColumnRenamed("n", "__n2").withColumnRenamed("sv", "__sv2")
    a.join(bb, Seq("cell_id"), "full_outer")
      .select(col("cell_id"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__n2"), lit(0L))).as("n"),
        zip_with(coalesce(col("sv"), zeros), coalesce(col("__sv2"), zeros),
          (x, y) => x + y).as("sv"))
  }

  /** Drift report per cell: how far the CURRENT member mean has wandered
    * from the FROZEN trained centroid — `drift = 1 − cos(trained sum
    * vector, member sum vector)` (cosine of means == cosine of sums;
    * the double dot stays exact while per-element products < 2^53,
    * comfortably true for the 2^10-quantized vectors at any realistic
    * cell size). Cells with `drift > threshold` are flagged `drifted` —
    * the re-seed set: re-centering ONLY those cells keeps maintenance
    * O(|drifted| · dim) instead of a full retrain. Output: cell_id,
    * n_members, drift, drifted. */
  def ivfDriftReport(stats: DataFrame, sums: Array[Array[Long]],
                     counts: Array[Long], threshold: Double): DataFrame = {
    val spark = stats.sparkSession
    import spark.implicits._
    val trained = sums.zipWithIndex
      .map { case (sv, c) => (c.toLong, sv) }.toSeq
      .toDF("cell_id", "tsv")
    val tsv = toDouble(col("tsv"))
    val sv = toDouble(col("sv"))
    stats.join(broadcast(trained), "cell_id")
      .select(col("cell_id"), col("n").as("n_members"),
        (lit(1.0) - dot(tsv, sv) / (sqrt(dot(tsv, tsv)) * sqrt(dot(sv, sv))))
          .as("drift"))
      .withColumn("drifted", col("drift") > threshold)
  }

  /** Apply the [[ivfDriftReport]] decision: cells whose drift exceeds
    * `threshold` take their CURRENT member stats as the new centroid
    * state (sum-vector + count — the mean-dot assignment metric's
    * exact representation); undrifted cells keep the trained state.
    * O(|cells| · dim) driver work on the kilobyte stats table — re-
    * seeding never touches corpus rows, which is the point: the
    * index stays assignment-stable for unchanged cells (vectors
    * already routed there keep their cell), while wandered cells
    * re-center so FUTURE assignments track the data. Returns the new
    * (sums, counts) state in [[trainCentroidsQuant]]'s shape. */
  def ivfReseed(stats: DataFrame, sums: Array[Array[Long]],
                counts: Array[Long], threshold: Double,
                dim: Int = 64): (Array[Array[Long]], Array[Long]) = {
    import org.apache.spark.sql.Row
    val drifted = ivfDriftReport(stats, sums, counts, threshold)
      .filter(col("drifted"))
      .join(stats, "cell_id")
      .select("cell_id", "n", "sv")
      .collect() // bounded: <= nCells rows of dim longs
      .map { case Row(c: Long, n: Long, sv: scala.collection.Seq[_]) =>
        (c.toInt, (sv.asInstanceOf[scala.collection.Seq[Long]].toArray, n))
      }.toMap
    val newSums = Array.tabulate(sums.length)(c =>
      drifted.get(c).map(_._1).getOrElse(sums(c)))
    val newCounts = Array.tabulate(counts.length)(c =>
      drifted.get(c).map(_._2).getOrElse(counts(c)))
    (newSums, newCounts)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding corpus, then inside each
    * cluster mark as a semantic duplicate every vector whose cosine to
    * a LOWER-id cluster-mate exceeds `threshold` — the earliest member
    * of each semantic group survives. Output one verdict row per
    * corpus vector: (vec_id, cell_id, dup_of) with dup_of = the lowest
    * qualifying cluster-mate id, NULL = kept.
    *
    * Clustering reuses [[trainCentroidsQuant]] — deterministic integer
    * k-means — so the ENTIRE operator (seeding, Lloyd rounds,
    * assignment, in-cell pair cosines, verdicts) replays bit-for-bit
    * in a plain-SQL oracle.
    *
    * Scale shape: the pairwise stage is a hash equi-join on cell_id,
    * so cost tracks Σ|cell|² — bounded by sizing nCells ≈
    * |corpus| / targetCellSize (the paper's regime, cells of ~1k-10k
    * at web scale) — never |corpus|². Driver state is nCells × dim
    * longs regardless of corpus size; corpus rows shuffle once, on
    * cell_id. */
  def semanticDedup(corpus: DataFrame, threshold: Double, nCells: Int = 16,
                    iters: Int = 2, dim: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (sums, counts) = trainCentroidsQuant(corpus, nCells, iters, dim)
    val bcS = spark.sparkContext.broadcast(sums)
    val bcN = spark.sparkContext.broadcast(counts)
    val cells = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id, bestCellQuant(quantizeVec(v, dim), bcS.value, bcN.value).toLong, v)
      }
      .toDF("vec_id", "cell_id", "emb")
    val keep = cells.select(col("cell_id"), col("vec_id").as("kept_id"),
      col("emb").as("ke"))
    val cand = cells.select(col("cell_id"), col("vec_id").as("cand_id"),
      col("emb").as("ce"))
    val dups = keep.join(cand, "cell_id")
      .filter(col("kept_id") < col("cand_id"))
      .filter(cosine(col("ke"), col("ce")) > threshold)
      .groupBy(col("cand_id").as("vec_id"))
      .agg(min("kept_id").as("dup_of"))
    cells.select("vec_id", "cell_id")
      .join(dups, Seq("vec_id"), "left")
      .select("vec_id", "cell_id", "dup_of")
  }

  // ---- Product quantization (PQ) — memory-bound ANN -------------------
  //
  // The missing rung of the E2 ladder between int8 (4x compression,
  // full-precision search) and IVF (cluster-pruned candidates): encode
  // every vector as m sub-space code indices (m bytes/vector at k<=256
  // — 256x smaller than float32 at m=8), search by asymmetric distance
  // computation (ADC): per query, an m x k lookup table of exact
  // sub-distances; per corpus row, the sum of m table entries. At
  // 100 TB this is what fits an embedding index in executor memory.
  //
  // Deterministic in the quantized-IVF house style so the WHOLE
  // pipeline (per-subspace Lloyd, encoding, ADC ranking) replays in a
  // SQL oracle: sub-centroids are exact (sum-vector, count) pairs;
  // the distance of quantized x to centroid (S, n) is ranked by
  // A = Σ_i (n·x_i − S_i)² — an EXACT integer — divided once into
  // A/n² (one deterministic long→double conversion + one IEEE
  // division). Exactness bound: |n·x_i − S_i| <= 2·n·2^12, so A stays
  // inside a signed long while per-cell membership n < ~70k (with the
  // |v| < 4 input contract) — train with k sized so cells stay under
  // that, or the require below fails loudly rather than ranking on
  // silently wrapped integers.

  /** Exact-integer squared distance of a quantized sub-vector to a
    * sub-centroid (S, n), scaled by n²: Σ (n·x_i − S_i)², then one
    * double division by n² — deterministic and SQL-replayable. */
  private def pqDist(x: Array[Long], off: Int, s: Array[Long], n: Long): Double = {
    var a = 0L
    var i = 0
    while (i < s.length) { val t = n * x(off + i) - s(i); a += t * t; i += 1 }
    a.toDouble / (n * n).toDouble
  }

  private def pqBestCode(x: Array[Long], off: Int,
                         sums: Array[Array[Long]], counts: Array[Long]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < sums.length) {
      val d = pqDist(x, off, sums(j), counts(j))
      if (d < bestD) { bestD = d; best = j } // strict < keeps lowest code on ties
      j += 1
    }
    best
  }

  /** Train per-subspace codebooks: `m` subspaces of dim/m dims, `k`
    * codes each. Seeds are the k corpus rows first in mix32(vec_id+1)
    * order (their sub-vectors seed every subspace), refined by `iters`
    * rounds of exact integer Lloyd per subspace — all m subspaces
    * train in the SAME pass over the corpus (one narrow scan per
    * round, m·k·(dim/m) longs of broadcast state). Returns
    * (sums[s][j], counts[s][j]).
    *
    * At billion-vector scale, train on a deterministic SAMPLE (e.g.
    * `corpus.filter(pmod(xxhash64($"vec_id"), N) === 0)`) — standard PQ
    * practice, and what keeps per-cell membership inside the
    * exact-integer distance bound below; encoding/search then run over
    * the full corpus under the frozen sampled codebooks. */
  private[graft] def pqTrain(corpus: DataFrame, m: Int, k: Int, iters: Int,
      dim: Int): (Array[Array[Array[Long]]], Array[Array[Long]]) = {
    require(dim % m == 0, s"pq: dim=$dim not divisible by m=$m")
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val seeds = corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (mix32(id + 1), id, quantizeVec(v, dim)) }
      .toDF("h", "vec_id", "qv")
      .orderBy("h", "vec_id").limit(k)
      .select(col("qv")).as[Array[Long]].collect()
    require(seeds.length == k, s"pq: corpus smaller than k=$k")
    var sums = Array.tabulate(m, k)((s, j) =>
      java.util.Arrays.copyOfRange(seeds(j), s * sub, (s + 1) * sub))
    var counts = Array.fill(m, k)(1L)
    val vecs = corpus.select(col("embedding")).as[Array[Float]]
    var it = 0
    while (it < iters) {
      val bcS = spark.sparkContext.broadcast(sums)
      val bcN = spark.sparkContext.broadcast(counts)
      val partials = vecs.mapPartitions { rows =>
        val (s0, n0) = (bcS.value, bcN.value)
        val acc = Array.fill(m, k)(new Array[Long](sub))
        val cnt = Array.fill(m, k)(0L)
        rows.foreach { v =>
          val qv = quantizeVec(v, dim)
          var s = 0
          while (s < m) {
            val c = pqBestCode(qv, s * sub, s0(s), n0(s))
            val a = acc(s)(c)
            var i = 0
            while (i < sub) { a(i) += qv(s * sub + i); i += 1 }
            cnt(s)(c) += 1
            s += 1
          }
        }
        Iterator.tabulate(m)(s => (s, acc(s), cnt(s)))
      }.collect()
      val nextS = Array.fill(m, k)(new Array[Long](sub))
      val nextN = Array.fill(m, k)(0L)
      partials.foreach { case (s, accs, cnts) =>
        var j = 0
        while (j < k) {
          var i = 0
          while (i < sub) { nextS(s)(j)(i) += accs(j)(i); i += 1 }
          nextN(s)(j) += cnts(j)
          j += 1
        }
      }
      // empty codes keep their previous state
      sums = Array.tabulate(m, k)((s, j) =>
        if (nextN(s)(j) == 0) sums(s)(j) else nextS(s)(j))
      counts = Array.tabulate(m, k)((s, j) =>
        if (nextN(s)(j) == 0) counts(s)(j) else nextN(s)(j))
      bcS.destroy(); bcN.destroy()
      it += 1
    }
    // the exactness bound above: fail loudly before ranking could wrap.
    // pqDist sums `sub` terms each bounded by n^2 * 2^26 (13-bit
    // quantized elements), so exactness needs n^2 * 2^26 * sub < 2^63 —
    // the admissible n SHRINKS as the subspace widens (m=2/dim=64 ⇒
    // sub=32 ⇒ n < 65536, tighter than the old flat 70000)
    val cellBound = math.sqrt(Long.MaxValue / (sub.toDouble * (1L << 26))).toLong
    counts.foreach(_.foreach(n => require(n < cellBound,
      s"pq: a sub-cell holds $n members — beyond the exact-integer " +
        s"distance bound $cellBound for sub-dim $sub; raise k (or sample " +
        "the training corpus) so cells stay under the bound")))
    (sums, counts)
  }

  /** Encode every corpus row as its m nearest sub-codes under a FROZEN
    * codebook: (vec_id, codes array<int>) — m small ints per vector,
    * the parquet-storable compressed index. One narrow pass. */
  def pqEncode(corpus: DataFrame, sums: Array[Array[Array[Long]]],
               counts: Array[Array[Long]], dim: Int = 64): DataFrame = {
    val m = sums.length
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcS = spark.sparkContext.broadcast(sums)
    val bcN = spark.sparkContext.broadcast(counts)
    corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val qv = quantizeVec(v, dim)
        (id, Array.tabulate(m)(s => pqBestCode(qv, s * sub, bcS.value(s), bcN.value(s))))
      }
      .toDF("vec_id", "codes")
  }

  /** PQ approximate top-k with exact rescore: train (m subspaces × k
    * codes), encode the corpus, SHORTLIST topK·rescore candidates per
    * query by ADC — per query an m×k table of exact sub-distances, per
    * corpus row the LEFT-ASSOCIATED sum of its m table entries (fixed
    * association, so the double ranking replays bit-for-bit in SQL) —
    * then re-rank the shortlist by the EXACT integer L2 between the
    * quantized vectors (Σ(x_i − y_i)², a plain long). The rescore is
    * what PQ deployments do (ADC discriminates BETWEEN cells, not
    * within one), and making it integer keeps the whole pipeline
    * deterministic. Output: query_id, neighbor_id, l2 (exact quantized
    * squared distance), rk.
    *
    * Scale shape: the codebook is m·k·(dim/m) longs broadcast; the
    * corpus is scanned once to encode and once to score (both narrow);
    * only the |queries|·topK·rescore SHORTLIST fetches full vectors
    * (hash join back to the corpus, shortlist broadcast) — the ADC pass
    * touches m ints per vector, which is what still fits in memory
    * when float vectors no longer do. Top-k through the bounded-heap
    * GroupedTopK at both stages. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, topK: Int,
             m: Int = 4, codes: Int = 16, iters: Int = 1,
             dim: Int = 64, rescore: Int = 4): DataFrame = {
    val (sums, counts) = pqTrain(corpus, m, codes, iters, dim)
    pqSearch(queries, corpus, pqEncode(corpus, sums, counts, dim),
      sums, counts, topK, dim, rescore)
  }

  /** The steady-state half of [[pqTopK]]: search a PREBUILT index
    * (frozen codebooks + encoded corpus) — what a per-ingest query
    * pays once training is amortized. `corpus` is consulted only for
    * the shortlist's exact-rescore fetch. */
  def pqSearch(queries: DataFrame, corpus: DataFrame, encoded: DataFrame,
               sums: Array[Array[Array[Long]]], counts: Array[Array[Long]],
               topK: Int, dim: Int = 64, rescore: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = sums.length
    val codes = sums.head.length
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcS = spark.sparkContext.broadcast(sums)
    val bcN = spark.sparkContext.broadcast(counts)
    // per query: the flattened m×k ADC table (exact sub-distances)
    val qTables = queries.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val qv = quantizeVec(v, dim)
        (id, Array.tabulate(m * codes) { x =>
          val s = x / codes
          pqDist(qv, s * sub, bcS.value(s)(x % codes), bcN.value(s)(x % codes))
        })
      }
      .toDF("query_id", "t")
    val scored = encoded.join(broadcast(qTables),
        col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("codes"), col("t"))
      .as[(Long, Long, Array[Int], Array[Double])]
      .map { case (qid, nid, cs, t) =>
        // fixed left-to-right association — mirrored in the oracle
        var d = 0.0
        var s = 0
        while (s < m) { d += t(s * codes + cs(s)); s += 1 }
        (qid, nid, d)
      }
      .toDF("query_id", "neighbor_id", "adc")
    val shortlist = graft.plans.GroupedTopK(
      scored, Seq("query_id"), topK * rescore,
      Seq(("adc", false), ("neighbor_id", false)))
    // exact integer rescore: only the shortlist fetches full vectors
    def quantized(df: DataFrame, idAs: String, vAs: String) =
      df.select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])]
        .map { case (id, v) => (id, quantizeVec(v, dim)) }
        .toDF(idAs, vAs)
    val l2 = aggregate(
      zip_with(col("nq"), col("qq"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val rescored = quantized(corpus, "neighbor_id", "nq")
      .join(broadcast(shortlist.select("query_id", "neighbor_id")), Seq("neighbor_id"))
      .join(broadcast(quantized(queries, "query_id", "qq")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), l2.as("l2"))
    val top = graft.plans.GroupedTopK(
      rescored, Seq("query_id"), topK, Seq(("l2", false), ("neighbor_id", false)))
    val w = Window.partitionBy("query_id").orderBy(col("l2"), col("neighbor_id"))
    top.withColumn("rk", row_number().over(w))
      .select("query_id", "neighbor_id", "l2", "rk")
  }

  /** Persist trained PQ codebooks as a parquet table (s, code_id, sv,
    * n) — train once, search for the life of the index. The loader
    * restores [[pqTrain]]'s exact (sums, counts) arrays, so a
    * round-tripped codebook encodes and searches bit-identically. */
  def savePqCodebooks(spark: org.apache.spark.sql.SparkSession,
                      sums: Array[Array[Array[Long]]],
                      counts: Array[Array[Long]], path: String): Unit = {
    import spark.implicits._
    (for { s <- sums.indices; j <- sums(s).indices }
      yield (s, j, sums(s)(j), counts(s)(j)))
      .toDF("s", "code_id", "sv", "n")
      .write.mode("overwrite").parquet(path)
  }

  def loadPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                      path: String): (Array[Array[Array[Long]]], Array[Array[Long]]) = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select("s", "code_id", "sv", "n")
      .as[(Int, Int, Array[Long], Long)].collect() // bounded: m·k codebook rows
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val sums = Array.ofDim[Array[Long]](m, k)
    val counts = Array.ofDim[Long](m, k)
    rows.foreach { case (s, j, sv, n) => sums(s)(j) = sv; counts(s)(j) = n }
    require(sums.forall(_.forall(_ != null)),
      s"loadPqCodebooks: $path is missing (s, code) entries")
    (sums, counts)
  }

  /** Persist trained IVF coarse centroids as a parquet table (cell_id,
    * sv, n) — the [[savePqCodebooks]] twin for the cell quantizer, so a
    * full IVF×PQ index (centroids + codebooks + encoded corpus) round-
    * trips through storage and serves bit-identically. */
  def saveIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       sums: Array[Array[Long]], counts: Array[Long],
                       path: String): Unit = {
    import spark.implicits._
    sums.indices.map(c => (c.toLong, sums(c), counts(c)))
      .toDF("cell_id", "sv", "n")
      .write.mode("overwrite").parquet(path)
  }

  def loadIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       path: String): (Array[Array[Long]], Array[Long]) = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select("cell_id", "sv", "n")
      .as[(Long, Array[Long], Long)].collect() // bounded: nCells rows
    val n = rows.map(_._1).max.toInt + 1
    val sums = Array.ofDim[Array[Long]](n)
    val counts = Array.ofDim[Long](n)
    rows.foreach { case (c, sv, cn) => sums(c.toInt) = sv; counts(c.toInt) = cn }
    require(sums.forall(_ != null),
      s"loadIvfCentroids: $path is missing cell entries")
    (sums, counts)
  }

  /** IVF × PQ — the production index composition: IVF cells PRUNE the
    * candidate set (each query probes its nProbe nearest cells; only
    * same-cell rows are scored — a hash equi-join on cell id, never a
    * corpus-wide pass), and PQ codes COMPRESS the scoring (ADC over m
    * ints per candidate, exact integer-L2 rescore of the shortlist
    * only). Both halves are the deterministic trainers above sharing
    * one corpus scan each, so the full composed pipeline replays in
    * SQL (e2_ivfpq_topk).
    *
    * Scale shape at 100 TB: the coarse quantizer bounds candidates to
    * nProbe/nCells of the corpus; the fine quantizer bounds per-
    * candidate work to m table lookups; full vectors are fetched only
    * for |queries|·topK·rescore rows. This is the index layout that
    * serves billion-vector corpora from executor memory. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, topK: Int,
                nCells: Int = 16, nProbe: Int = 4, ivfIters: Int = 2,
                m: Int = 4, codes: Int = 16, pqIters: Int = 1,
                dim: Int = 64, rescore: Int = 4): DataFrame = {
    val idx = ivfPqBuild(corpus, nCells, ivfIters, m, codes, pqIters, dim)
    ivfPqSearch(queries, corpus, idx.index, idx.cellSums, idx.cellCounts,
      idx.pqSums, idx.pqCounts, topK, nProbe, dim, rescore)
  }

  /** A built IVF×PQ index: trained coarse centroids, trained PQ
    * codebooks, and the encoded corpus index (neighbor_id, cell_id,
    * codes) — m ints + one cell id per vector, the parquet-persistable
    * form ([[saveIvfCentroids]] / [[savePqCodebooks]] for the trained
    * state; `index.write.parquet` for the assignments). */
  final case class IvfPqIndex(cellSums: Array[Array[Long]],
                              cellCounts: Array[Long],
                              pqSums: Array[Array[Array[Long]]],
                              pqCounts: Array[Array[Long]],
                              index: DataFrame)

  /** Train both quantizers and encode the corpus — the ONE-TIME build
    * half of [[ivfPqTopK]]. One corpus scan per Lloyd round for each
    * trainer, then a single narrow pass assigning cell + codes
    * together. Persist the three pieces and serve queries forever with
    * [[ivfPqSearch]] — the production story where training is
    * amortized across the index's lifetime rather than paid per
    * query. */
  def ivfPqBuild(corpus: DataFrame, nCells: Int = 16, ivfIters: Int = 2,
                 m: Int = 4, codes: Int = 16, pqIters: Int = 1,
                 dim: Int = 64): IvfPqIndex = {
    val (cellS, cellN) = trainCentroidsQuant(corpus, nCells, ivfIters, dim)
    val (pqS, pqN) = pqTrain(corpus, m, codes, pqIters, dim)
    IvfPqIndex(cellS, cellN, pqS, pqN,
      ivfPqEncode(corpus, cellS, cellN, pqS, pqN, dim))
  }

  /** Assign cell + PQ codes for every `(vec_id, embedding)` row under
    * FROZEN trained state — the encode half of [[ivfPqBuild]] factored
    * out so the ingestion stream ([[graft.streaming.Streams
    * .ivfPqIndexSink]]) can encode each microbatch with the exact
    * arithmetic the one-shot build uses: streamed assignments union to
    * the one-shot index row-for-row. One narrow pass, trained state
    * broadcast (kilobytes), the corpus never reshuffles. */
  def ivfPqEncode(corpus: DataFrame,
                  cellS: Array[Array[Long]], cellN: Array[Long],
                  pqS: Array[Array[Array[Long]]], pqN: Array[Array[Long]],
                  dim: Int = 64): DataFrame = {
    val m = pqS.length
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcCS = spark.sparkContext.broadcast(cellS)
    val bcCN = spark.sparkContext.broadcast(cellN)
    val bcS = spark.sparkContext.broadcast(pqS)
    val bcN = spark.sparkContext.broadcast(pqN)
    // one corpus pass: cell assignment + PQ codes together
    corpus.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val qv = quantizeVec(v, dim)
        (id, bestCellQuant(qv, bcCS.value, bcCN.value).toLong,
          Array.tabulate(m)(s => pqBestCode(qv, s * sub, bcS.value(s), bcN.value(s))))
      }
      .toDF("neighbor_id", "cell_id", "codes")
  }

  /** The `nProbe` best cells for one quantized query vector, by the
    * deferred-division mean-dot metric with the [[ivfPqSearch]] tie
    * order (higher dot first, then lower cell id) — factored out so a
    * driver-side probed-cell IN-list (the maintained index's
    * file-pruning predicate, [[graft.streaming.Streams
    * .ivfPqSearchMaintained]]) is computed by the EXACT ordering the
    * distributed probe pass uses. */
  private[graft] def probeCellsOf(qv: Array[Long], cellS: Array[Array[Long]],
                                  cellN: Array[Long],
                                  nProbe: Int): Array[Long] = {
    val ms = Array.tabulate(cellS.length) { c =>
      var d = 0L
      var i = 0
      val s = cellS(c)
      while (i < qv.length) { d += qv(i) * s(i); i += 1 }
      (d.toDouble / cellN(c).toDouble, c.toLong)
    }
    ms.sortBy { case (d, c) => (-d, c) }.take(nProbe).map(_._2)
  }

  /** Targeted VECTOR deletion from a persisted [[ivfPqBuild]] index —
    * the right-to-be-forgotten completion for the ANN path (corpus-side
    * twin: [[Layout.targetedDelete]]; retrieval-side:
    * [[TextAnalysis.bm25IndexDelete]]). Only the (neighbor_id, cell_id,
    * codes) assignments table rewrites — centroids and codebooks are
    * TRAINED PARAMETERS, and deletion does not retrain them (the
    * standard IVF contract; re-seed on drift is
    * [[ivfIncrementalIngest]]'s separate concern). Deleted ids can
    * never reach a shortlist afterwards, so they never appear in
    * results regardless of what the rescore corpus still holds — but
    * run the corpus-side delete too, or the raw vectors survive.
    * Survivors land in a fresh directory then swap, never
    * read-and-overwrite one path. */
  def ivfPqIndexDelete(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, ids: Seq[Long],
                       maxValues: Int = 1024): Unit = {
    require(ids.nonEmpty, "Similarity.ivfPqIndexDelete: no ids")
    require(ids.length <= maxValues,
      s"Similarity.ivfPqIndexDelete: ${ids.length} ids exceeds $maxValues — " +
        "a deletion set that large is a rebuild, not an index op")
    spark.read.parquet(indexDir)
      // NULL ids are not in the deletion set — `!isin` alone would
      // evaluate to NULL on them and silently drop the rows
      .filter(col("neighbor_id").isNull || !col("neighbor_id").isin(ids: _*))
      .write.mode("overwrite").parquet(s"$indexDir.__new")
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(indexDir), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$indexDir.__new"),
      new org.apache.hadoop.fs.Path(indexDir))
    spark.catalog.refreshByPath(indexDir)
  }

  /** The STEADY-STATE half of [[ivfPqTopK]]: search a PREBUILT index —
    * frozen centroids + codebooks (broadcast; kilobytes) and the
    * persisted (neighbor_id, cell_id, codes) table. Cells prune (hash
    * equi-join on cell_id bounds candidates to ~nProbe/nCells of the
    * corpus), codes compress scoring (ADC = m table lookups per
    * candidate); `corpus` is consulted only for the
    * |queries|·topK·rescore shortlist's exact integer rescore. A
    * reloaded index searches bit-identically to the in-process one
    * (SimilaritySpec). */
  def ivfPqSearch(queries: DataFrame, corpus: DataFrame, index: DataFrame,
                  cellS: Array[Array[Long]], cellN: Array[Long],
                  pqS: Array[Array[Array[Long]]], pqN: Array[Array[Long]],
                  topK: Int, nProbe: Int = 4, dim: Int = 64,
                  rescore: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = pqS.length
    val codes = pqS.head.length
    val sub = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcCS = spark.sparkContext.broadcast(cellS)
    val bcCN = spark.sparkContext.broadcast(cellN)
    val bcS = spark.sparkContext.broadcast(pqS)
    val bcN = spark.sparkContext.broadcast(pqN)
    val indexed = index.select(col("neighbor_id"), col("cell_id"), col("codes"))
    // queries: nProbe best cells + the flattened ADC table, one row per
    // (query, probed cell) with the table along for the equi-join
    val probes = queries.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val qv = quantizeVec(v, dim)
        val t = Array.tabulate(m * codes) { x =>
          val s = x / codes
          pqDist(qv, s * sub, bcS.value(s)(x % codes), bcN.value(s)(x % codes))
        }
        probeCellsOf(qv, bcCS.value, bcCN.value, nProbe)
          .map(c => (id, c, t)).toSeq
      }
      .toDF("query_id", "cell_id", "t")
    val scored = indexed.join(broadcast(probes), "cell_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("codes"), col("t"))
      .as[(Long, Long, Array[Int], Array[Double])]
      .map { case (qid, nid, cs, t) =>
        var d = 0.0
        var s = 0
        while (s < m) { d += t(s * codes + cs(s)); s += 1 }
        (qid, nid, d)
      }
      .toDF("query_id", "neighbor_id", "adc")
    val shortlist = graft.plans.GroupedTopK(
      scored, Seq("query_id"), topK * rescore,
      Seq(("adc", false), ("neighbor_id", false)))
    def quantized(df: DataFrame, idAs: String, vAs: String) =
      df.select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])]
        .map { case (id, v) => (id, quantizeVec(v, dim)) }
        .toDF(idAs, vAs)
    val l2 = aggregate(
      zip_with(col("nq"), col("qq"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val rescored = quantized(corpus, "neighbor_id", "nq")
      .join(broadcast(shortlist.select("query_id", "neighbor_id")), Seq("neighbor_id"))
      .join(broadcast(quantized(queries, "query_id", "qq")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), l2.as("l2"))
    val top = graft.plans.GroupedTopK(
      rescored, Seq("query_id"), topK, Seq(("l2", false), ("neighbor_id", false)))
    val w = Window.partitionBy("query_id").orderBy(col("l2"), col("neighbor_id"))
    top.withColumn("rk", row_number().over(w))
      .select("query_id", "neighbor_id", "l2", "rk")
  }

  // ---- Int8 quantization (embedding storage at scale) -------------------

  /** Symmetric per-vector int8 quantization: scale = max|v|/127,
    * q_i = floor(v_i/scale + 0.5) — 4× smaller than float32 on disk and
    * over the wire, which at a 100TB embedding corpus is the difference
    * between caching the table and not. `floor(x + 0.5)` (not
    * `Math.round`-style half-even ambiguity) keeps the rounding
    * bit-identical in plain SQL, so the quantizer is oracle-checkable.
    * cos(v, dequantized) == cos(v, q) exactly (the positive scale
    * cancels), so reconstruction quality is measured directly on q.
    * Zero vectors quantize to zeros with scale 0. Output:
    * (vec_id, scale, q: array<byte>). */
  private def quantizeCore(v: Array[Float]): (Double, Array[Byte]) = {
    var maxAbs = 0.0
    var i = 0
    while (i < v.length) { val a = math.abs(v(i).toDouble); if (a > maxAbs) maxAbs = a; i += 1 }
    val scale = maxAbs / 127.0
    val q = new Array[Byte](v.length)
    if (scale > 0) {
      i = 0
      while (i < v.length) { q(i) = math.floor(v(i) / scale + 0.5).toByte; i += 1 }
    }
    (scale, q)
  }

  /** (vec_id, scale, q: binary) — q is true int8 on disk (parquet
    * BINARY), 4× smaller than the float32 column. Dequantize as
    * q(i) · scale. */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => val (scale, q) = quantizeCore(v); (id, scale, q) }
      .toDF("vec_id", "scale", "q")
  }

  /** Quantization quality report, one typed pass: (vec_id, scale,
    * q_sum, cos_recon) with cos_recon = cos(v, q) in double,
    * index-order accumulation (mirrors the SQL oracle exactly). */
  def quantizeInt8Report(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val (scale, q) = quantizeCore(v)
        var qSum = 0L
        var dot = 0.0; var nv = 0.0; var nq = 0.0
        var i = 0
        while (i < v.length) {
          val vd = v(i).toDouble; val qd = q(i).toDouble
          qSum += q(i)
          dot += vd * qd; nv += vd * vd; nq += qd * qd
          i += 1
        }
        val denom = math.sqrt(nv) * math.sqrt(nq)
        (id, scale, qSum, if (denom == 0.0) Double.NaN else dot / denom)
      }
      .toDF("vec_id", "scale", "q_sum", "cos_recon")
  }

  // ---- Deterministic integer sign-LSH (oracle-mirrorable) ---------------

  /** Avalanche-mixed 32-bit plane weights from the flat (plane, dim)
    * index — plain integer arithmetic (`*`, `%`, `xor`, `//`) so a SQL
    * oracle (DuckDB) reproduces every weight exactly. Gaussian planes
    * would be statistically nicer but are not reproducible in SQL;
    * sign-LSH only needs symmetric, decorrelated weights. */
  private[graft] def intPlaneWeights(nPlanes: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(nPlanes, dim) { (p, i) =>
      val x = p.toLong * dim + i + 1
      var h = (x * 2654435761L) % 4294967296L
      h ^= (h >> 16)
      h = (h * 40503L) % 4294967296L
      h ^= (h >> 13)
      h - 2147483648L
    }

  /** Quantization scale 2^20: multiplying a float-derived double by a
    * power of two is EXACT, so `floor(v * 2^20)` is bit-identical in the
    * JVM and in SQL — no rounding-mode or summation-order ambiguity can
    * flip a bucket sign. Overflow headroom: with |v| < 2^6 (enforced per
    * element), |q| <= 2^26, and the dot product against a plane is
    * bounded by `2^26 * sum_k |w_k|` — asserted < 2^63 per plane at
    * weight construction ([[intBucketSignatures]]), so int64 wrap is
    * impossible by construction rather than by expectation. (The earlier
    * 2^11 bound was wrong: 64 terms of 2^31-quantized x 2^31-weight
    * products reach ~2^68 and wrap silently in the JVM while a BIGINT
    * oracle errors out.) */
  private[graft] val QuantScale = 1048576L

  /** Largest per-element magnitude [[intBucketSignatures]] accepts;
    * embeddings here are unit-scale so real data sits far below it. */
  private[graft] val MaxAbsInput = 64.0

  /** (id, tbl, bucket) sign-LSH signatures over integer-quantized
    * projections — exact int64 arithmetic end-to-end, mirrorable in a
    * plain-SQL oracle. One narrow typed pass per row (`tables` output
    * rows each); candidates then come from an equi-join on
    * (tbl, bucket) — the 100TB shape, never all-pairs. */
  private[graft] def intBucketSignatures(df: DataFrame, idAs: String,
      tables: Int, planesPerTable: Int, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hp = intPlaneWeights(tables * planesPerTable, dim)
    // Exact overflow guarantee: |q_k| <= MaxAbsInput*QuantScale, so
    // |dot| <= maxQ * sum_k |w_k|. Checked on the constant weight table
    // once, here — not per row, and not left to expectation.
    val maxQ = (MaxAbsInput * QuantScale).toLong
    hp.foreach { plane =>
      val sumAbs = plane.foldLeft(0L)((a, w) => a + math.abs(w))
      require(sumAbs <= Long.MaxValue / maxQ,
        s"intLsh: plane weight mass $sumAbs could overflow int64 dot product")
    }
    df.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        require(v != null && v.length == dim,
          s"intLsh: embedding length ${if (v == null) "null" else v.length} != dim=$dim")
        val q = new Array[Long](dim)
        var i = 0
        while (i < dim) {
          val d = v(i).toDouble
          require(math.abs(d) < MaxAbsInput, s"intLsh: |v|=$d exceeds quantization headroom")
          q(i) = math.floor(d * QuantScale).toLong
          i += 1
        }
        val out = new Array[(Long, Int, Long)](tables)
        var t = 0
        while (t < tables) {
          var bucket = 0L
          var j = 0
          while (j < planesPerTable) {
            val plane = hp(t * planesPerTable + j)
            var s = 0L
            var k = 0
            while (k < dim) { s += q(k) * plane(k); k += 1 }
            if (s > 0) bucket |= (1L << j)
            j += 1
          }
          out(t) = (id, t, bucket)
          t += 1
        }
        out.toSeq
      }
      .toDF(idAs, "tbl", "bucket")
  }

  /** Approximate top-k via multi-table sign-LSH: candidates are rows
    * sharing a (table, bucket) cell with the query in at least one
    * table; exact cosine + window top-k within the (deduplicated)
    * candidates. Same output schema as [[bruteForceTopK]]; recall is
    * probabilistic and tested against the exact baseline. Signatures
    * come from [[intBucketSignatures]] — exact integer arithmetic, so
    * the whole operator is reproducible in a plain-SQL oracle.
    *
    * Scale shape: corpus scanned once to emit `tables` bucket entries
    * per row, then a hash-partitioned equi-join on (tbl, bucket) — never
    * a cross product. More tables → higher recall, more candidates. */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              tables: Int = 8, planesPerTable: Int = 4, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def bucketed(df: DataFrame, idAs: String) =
      intBucketSignatures(df, idAs, tables, planesPerTable, dim)
    // candidate id-pairs: collide in any table; dedupe ids only (cheap
    // shuffle), embeddings re-attached afterwards
    val cand = bucketed(corpus, "neighbor_id")
      .join(broadcast(bucketed(queries, "query_id")), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qv = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val cv = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    // top-k through the bounded-heap operator (k rows per group survive
    // the map side), THEN ranks on the tiny k×|queries| result — a
    // row_number window over the raw candidates would sort every
    // bucket-collision group in full (the bruteForceTopK pattern)
    val scored = cand.join(qv, "query_id").join(cv, "neighbor_id")
      .withColumn("cos", cosine(col("qe"), col("ne")))
      .select("query_id", "neighbor_id", "cos")
    val top = graft.plans.GroupedTopK(
      scored, Seq("query_id"), k, Seq(("cos", true), ("neighbor_id", false)))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    top.withColumn("rk", row_number().over(w))
      .select("query_id", "neighbor_id", "cos", "rk")
  }
}
