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
}
