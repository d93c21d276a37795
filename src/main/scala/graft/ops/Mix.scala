package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus mixing: resample a document table so each stratum (source,
  * language, quality bucket, …) contributes a target share of the
  * output — the "data mixture" step in front of training runs.
  *
  * Downsampling only (fraction capped at 1.0): the largest achievable
  * output size given the targets is computed from per-stratum counts,
  * then each stratum is Bernoulli-sampled at its own rate with a
  * deterministic seed. Data strata absent from `targetShares` are
  * dropped; a REQUESTED stratum absent from the data fails loudly (a
  * silently-missing 20% slice is a wrong training mixture).
  * Per-stratum counts are one aggregate (tiny: one row per stratum,
  * collected to the driver to compute fractions — not a data collect);
  * the sample itself is a narrow codegen'd filter, no shuffle.
  */
object Mix {

  /** Per-stratum sampling fractions realizing `targetShares`
    * (normalized internally) at the largest achievable total. */
  def fractionsFor[S](counts: Map[S, Long],
                      targetShares: Map[S, Double]): Map[S, Double] = {
    require(targetShares.nonEmpty, "Mix: no target shares")
    require(targetShares.values.forall(_ > 0), s"Mix: non-positive share in $targetShares")
    val missing = targetShares.keySet.diff(counts.keySet)
    require(missing.isEmpty, s"Mix: requested strata absent from data: $missing")
    val norm = targetShares.values.sum
    val shares = targetShares.view.mapValues(_ / norm).toMap
    // max total N with N * share(s) <= count(s) for every stratum
    val maxTotal = shares.keySet.map(s => counts(s) / shares(s)).min
    shares.keySet.map(s => s -> math.min(1.0, maxTotal * shares(s) / counts(s))).toMap
  }

  /** Resample `df` so `stratumCol`'s value distribution approximates
    * `targetShares`. Deterministic for a fixed seed. */
  def toProportions[S](df: DataFrame, stratumCol: String,
                       targetShares: Map[S, Double], seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(stratumCol).count()
      .collect().map(r => r.get(0).asInstanceOf[S] -> r.getLong(1)).toMap
    val fractions = fractionsFor(counts, targetShares)
    df.stat.sampleBy(stratumCol, fractions, seed)
  }

  /** Deterministic hash-based train/val/test split: each row's integral
    * `idCol` is avalanche-mixed ([[Similarity.mix32]], plain `*`/`%`/
    * `xor`/`//` arithmetic) into a bucket in [0, 10000); `splits` maps
    * cumulative per-myriad bounds to names, e.g.
    * `Seq(("train", 9800), ("val", 9900), ("test", 10000))`.
    *
    * Hash-based (not random) on purpose: the assignment is a pure
    * function of the id, so it is stable across runs, cluster layouts,
    * and INCREMENTAL INGESTION — a document keeps its split forever,
    * which is what keeps eval sets uncontaminated as the corpus grows.
    * Narrow codegen'd expression, no shuffle, and exactly mirrorable
    * in a SQL oracle. */
  /** [[graft.ops.Similarity.mix32]] as a Column over an integral id —
    * identical op chain to the JVM and SQL versions (divisions are by
    * powers of two, so the double intermediate stays exact). */
  def mix32Col(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    mix32Col(id, 0L)

  /** Seeded variant: the same avalanche chain over `id + 1 + seed` —
    * each seed yields an independent-looking permutation of the ids
    * (epoch shuffles, re-draws) while staying exactly mirrorable in
    * SQL. */
  def mix32Col(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column = {
    val x = id.cast("long") + lit(1L + seed)
    val h0 = pmod(x * lit(2654435761L), lit(4294967296L))
    val h1 = h0.bitwiseXOR(floor(h0 / 65536).cast("long"))
    val h2 = pmod(h1 * lit(40503L), lit(4294967296L))
    h2.bitwiseXOR(floor(h2 / 8192).cast("long"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis): draw
    * `n` rows with inclusion odds proportional to `weightCol`,
    * deterministically. Each row gets the priority key `ln(u)/w` with
    * `u = (mix32(id)+1)/2³² ∈ (0, 1]` — the classic `u^(1/w)` order
    * statistic in log space (identical ranking since ln is monotone,
    * but `ln` mirrors exactly in the DuckDB oracle where `pow` may
    * differ in the last ulp) — and the sample is the top-n keys.
    * Scale shape: one narrow pass + TakeOrderedAndProject (bounded
    * top-n per partition, no corpus shuffle, no global sort), and the
    * same seed always draws the same sample — reruns, A/B diffs and
    * incremental audits see stable membership. Non-positive weights
    * are excluded (zero odds). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int, seed: Long = 0L): DataFrame = {
    require(n > 0, s"Mix.weightedSample: n must be positive, got $n")
    val u = (mix32Col(col(idCol), seed) + lit(1L)) / lit(4294967296.0)
    df.filter(col(weightCol) > 0)
      .withColumn("__es_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__es_key").desc, col(idCol))
      .limit(n)
      .drop("__es_key")
  }

  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.last._2 == 10000,
      s"Mix.hashSplit: bounds must end at 10000, got $splits")
    require(splits.map(_._2) == splits.map(_._2).sorted,
      s"Mix.hashSplit: bounds must be ascending, got $splits")
    val bucket = pmod(mix32Col(col(idCol)), lit(10000L))
    val assign = splits.foldRight(lit(null).cast("string")) {
      case ((name, bound), rest) => when(bucket < bound, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /** Temperature-flattened source sampling (the multilingual-mixing
    * move from XLM-R / mT5: resample so stratum shares follow
    * count^α, α < 1 lifting the tail sources a proportional sample
    * would drown). Downsample-only, deterministic, and — for the
    * default α = 0.5 — EXACT integer arithmetic end-to-end:
    *
    *   w_s = floor(sqrt(c_s))  (IEEE sqrt is correctly rounded, so
    *                            floor∘sqrt is bit-identical in the JVM
    *                            and SQL; general α uses pow and is
    *                            driver-computed)
    *   t_s = min(c_s, N·w_s ÷ ΣW)   (integer division)
    *
    * and each stratum keeps its t_s rows of smallest (hash, id) —
    * stable across reruns and incremental ingestion.
    *
    * Scale shape: per-stratum counts are one tiny aggregate (model
    * state, rows = |strata|); selection runs through the bounded-heap
    * GroupedTopK at k = max t_s — at most k rows per stratum survive
    * the map side — and the exact per-stratum rank is then a window
    * over the ≤ k·|strata| survivors, never a sort of the input. */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
                        alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"Mix: need 0 < alpha <= 1, got $alpha")
    // cast the stratum to string for the driver-side model (any column
    // type works, like hashSplit/capPerStratum); the join below casts
    // the same way so matching is consistent
    val counts = df.groupBy(col(stratumCol).cast("string").as(stratumCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // |strata| rows
    require(counts.nonEmpty, "Mix: empty input")
    val w = counts.view.mapValues { c =>
      if (alpha == 0.5) math.sqrt(c.toDouble).toLong // exact: see scaladoc
      else math.floor(math.pow(c.toDouble, alpha)).toLong
    }.toMap
    val n = counts.values.sum
    val sumW = w.values.sum
    require(sumW > 0, "Mix: all stratum weights zero")
    require(w.values.forall(ws => ws == 0 || n <= Long.MaxValue / ws),
      "Mix: N * w_s overflows int64 — rescale weights")
    val targets = counts.map { case (s, c) => s -> math.min(c, n * w(s) / sumW) }
    // GroupedTopK's heap bound and row_number are Int — a stratum
    // target past 2^31 rows needs a different shape (pre-split the
    // stratum); fail loudly rather than wrap negative
    require(targets.values.max <= Int.MaxValue.toLong,
      s"Mix: a per-stratum target exceeds 2^31 rows (${targets.values.max}) — " +
        "pre-partition the stratum or lower alpha")
    val kMax = targets.values.max.toInt
    val spark = df.sparkSession
    import spark.implicits._
    val tdf = broadcast(targets.toSeq.toDF("__stratum_s", "__t"))
    val survivors = graft.plans.GroupedTopK(
      df.withColumn("__pri", mix32Col(col(idCol))),
      Seq(stratumCol), kMax, Seq(("__pri", false), (idCol, false)))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(col("__pri"), col(idCol))
    survivors
      .withColumn("__rn", row_number().over(wnd))
      .join(tdf, col(stratumCol).cast("string") === col("__stratum_s"))
      .filter(col("__rn") <= col("__t"))
      .select(df.columns.map(col).toIndexedSeq: _*) // original column order
  }

  /** Per-stratum frequency capping: keep at most `cap` rows per value
    * of `stratumCol` (domain caps in web corpora — no single source may
    * dominate the mixture), chosen deterministically by hash priority
    * ([[mix32Col]] of the id, id tiebreak) so reruns keep the SAME
    * survivors. Runs through the bounded-heap GroupedTopK operator: at
    * most `cap` rows per stratum survive the map side, so a stratum
    * with 10^9 rows costs a cap-sized heap, never a per-stratum sort. */
  def capPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                    cap: Int): DataFrame =
    graft.plans.GroupedTopK(
      df.withColumn("__pri", mix32Col(col(idCol))),
      Seq(stratumCol), cap, Seq(("__pri", false), (idCol, false)))
      .drop("__pri")
}
