package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much more likely its hashed-token
  * distribution is under a TARGET corpus model than under the raw
  * model — the importance weight that, used as a resampling priority,
  * tilts a web-scale corpus toward a curated target domain.
  *
  * Features are hashed token buckets (the paper's hashed n-grams):
  * bucket = fnv64(token) mod B. Both models are add-1-smoothed
  * multinomials over the B buckets:
  *
  *   log w(x) = Σ_tokens [ ln p_target(b(tok)) − ln p_raw(b(tok)) ]
  *
  * Deterministic — no Gumbel noise; downstream selection is a
  * threshold or top-k over `logw` (kept out of this operator so the
  * weight itself stays exactly oracle-checkable).
  *
  * Scale shape: both models are ≤ B-row aggregates of one token scan
  * (map-side combinable), their totals derive from those same
  * aggregates (no extra pass), and the per-doc score is one broadcast
  * join of the B-row model against the token stream plus one shuffle
  * on doc id. Driver state is the two scalar totals; nothing
  * data-sized collects.
  */
object Dsir {

  /** (idCol, n_tokens, logw) for every doc of `raw` with ≥1 token.
    * `isTarget` marks the rows whose tokens fit the target model —
    * typically a small curated slice of the same table (the paper's
    * Wikipedia/books targets) or a join flag.
    *
    * Exactly two token-stream scans: one map-side-combinable aggregate
    * producing both models' bucket counts at once (≤ B rows — bounded
    * model state collected to the driver, which also yields the totals
    * with no extra pass), and one scoring scan against the broadcast
    * B-row log-ratio table. */
  def importanceWeights(raw: DataFrame, isTarget: Column, idCol: String,
                        textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "Dsir: buckets must be positive")
    val spark = raw.sparkSession
    import spark.implicits._
    val tok = raw.select(col(idCol), isTarget.as("__t"),
        explode(filter(split(col(textCol), " "), t => t =!= "")).as("token"))
      .withColumn("b", pmod(call_function("fnv64", col("token")), lit(buckets.toLong)))
    // scan 1: both bucket-count vectors in one aggregate
    val cnts = tok.groupBy("b")
      .agg(count(lit(1)).as("cr"),
        count(when(col("__t"), lit(1))).as("ct"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nR = cnts.map(_._2).sum
    val nT = cnts.map(_._3).sum
    // same IEEE ops as a SQL ln((c+1)/(N+B)): Math.log on one double ÷
    val model = cnts.toSeq.map { case (b, crC, ctC) =>
      (b, math.log((ctC + 1).toDouble / (nT + buckets).toDouble)
        - math.log((crC + 1).toDouble / (nR + buckets).toDouble))
    }.toDF("b", "lw")
    // scan 2: score every token against the broadcast model
    tok.join(broadcast(model), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("lw").as("logw"))
  }
}
