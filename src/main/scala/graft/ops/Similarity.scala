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
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cells.join(probes, "cell_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qe"), col("ne")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cos", "rk")
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
    * flip a bucket sign. Overflow headroom: |q| <= |v|·2^20, so with
    * |v| < 2^11 the 64-dim integer dot against 2^31 weights stays
    * below 2^63. */
  private[graft] val QuantScale = 1048576L

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
    df.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        require(v != null && v.length == dim,
          s"intLsh: embedding length ${if (v == null) "null" else v.length} != dim=$dim")
        val q = new Array[Long](dim)
        var i = 0
        while (i < dim) {
          val d = v(i).toDouble
          require(math.abs(d) < 2048.0, s"intLsh: |v|=$d exceeds quantization headroom")
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
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(qv, "query_id").join(cv, "neighbor_id")
      .withColumn("cos", cosine(col("qe"), col("ne")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cos", "rk")
  }
}
