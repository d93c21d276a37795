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

  /** Cosine similarity of two array<float|double> columns, in double. */
  def cosine(a: Column, b: Column): Column = {
    val (ad, bd) = (toDouble(a), toDouble(b))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Exact cosine top-k: for each row of `queries`, the k nearest rows
    * of `corpus` (self-matches on equal ids excluded). Output:
    * query_id, neighbor_id, cos, rk (1-based). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val scored = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qe"), col("ne")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cos", "rk")
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed) for LSH. */
  private def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bucket signature: bit j = sign(<v, h_j>). */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column = {
    val hp = hyperplanes(nPlanes, dim)
    val vd = toDouble(v)
    (0 until nPlanes).map { j =>
      val proj = aggregate(
        zip_with(vd, lit(hp(j)), (x, h) => x * h), lit(0.0), (acc, p) => acc + p)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Approximate top-k: candidates share the LSH bucket with the query;
    * exact cosine + window top-k within candidates. Same output schema
    * as [[bruteForceTopK]]; recall < 1 (more planes → fewer, purer
    * buckets; fewer planes → higher recall). */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .withColumn("bucket", lshBucket(col("qe"), nPlanes, dim)))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      .withColumn("bucket", lshBucket(col("ne"), nPlanes, dim))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qe"), col("ne")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cos", "rk")
  }
}
