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
    * Wikipedia/books targets) or a join flag. */
  def importanceWeights(raw: DataFrame, isTarget: Column, idCol: String,
                        textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "Dsir: buckets must be positive")
    val tok = raw.select(col(idCol), isTarget.as("__t"),
        explode(filter(split(col(textCol), " "), t => t =!= "")).as("token"))
      .withColumn("b", pmod(call_function("fnv64", col("token")), lit(buckets.toLong)))
    val cr = tok.groupBy("b").agg(count(lit(1)).as("cr"))
    val ct = tok.filter(col("__t")).groupBy("b").agg(count(lit(1)).as("ct"))
    // totals from the bucket aggregates — B rows, not a corpus pass
    val nR = cr.agg(sum("cr")).collect()(0).getLong(0)
    val nT = ct.agg(coalesce(sum("ct"), lit(0L))).collect()(0).getLong(0)
    val model = cr.join(ct, Seq("b"), "left").select(col("b"),
      (log((coalesce(col("ct"), lit(0L)) + 1).cast("double")
          / lit((nT + buckets).toDouble))
        - log((col("cr") + 1).cast("double")
          / lit((nR + buckets).toDouble))).as("lw"))
    tok.join(broadcast(model), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("lw").as("logw"))
  }
}
