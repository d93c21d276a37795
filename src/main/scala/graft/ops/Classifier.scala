package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document classification: multinomial Naive Bayes over
  * whitespace tokens — the distributed take on the fastText-style
  * linear filters real training-data pipelines run in front of the
  * corpus (language ID, quality tiers, domain routing).
  *
  * Naive Bayes on purpose: training IS counting, so the whole model —
  * per-class token counts, class totals, vocabulary size, doc priors —
  * is two `groupBy` aggregations (map-side combinable, one shuffle
  * each), trivially incremental (counts add), and exactly mirrorable
  * in a SQL oracle, none of which holds for gradient-trained models.
  * Scoring is one equi-join from token occurrences to the count table
  * keyed (label, token) followed by a per-(doc, label) sum — at 100 TB
  * the model table is |vocab|×|labels| (shrinkable with `minCount`)
  * and broadcasts when small, while the corpus-side explode stays
  * narrow; nothing touches the driver except the scalar vocab size.
  *
  * Laplace-smoothed log-likelihood, argmax with a deterministic
  * label-ascending tie-break:
  * `score(d,l) = ln P(l) + Σ_tok ln((c(l,tok)+1) / (n_l + |V|))`.
  */
object Classifier {

  /** Trained model: `labels` is one row per class
    * (label, n_tokens, n_docs), tiny; `tokenCounts` is keyed
    * (label, tok) → c; `vocabSize` and `totalDocs` are scalars. */
  final case class NbModel(labels: DataFrame, tokenCounts: DataFrame,
                           vocabSize: Long, totalDocs: Long)

  /** Train on `train`, counting token OCCURRENCES per class (standard
    * multinomial NB). `minCount` prunes rare (label, token) counts —
    * at corpus scale the long tail of hapaxes dominates |vocab| while
    * contributing near-zero evidence; pruning bounds the model table.
    * Pruned-out occurrences still count toward class totals, so
    * smoothing stays honest. */
  def naiveBayesTrain(train: DataFrame, textCol: String, labelCol: String,
                      minCount: Long = 1L): NbModel = {
    val toks = train.select(col(labelCol).as("label"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("label", "tok").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("label").agg(sum("c").as("n_tokens"))
    val vocabSize = counts.select("tok").distinct().count()
    val priors = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    // left join FROM priors: a class whose training docs are all
    // empty/whitespace has no token rows, but its prior mass must
    // survive (n_tokens = 0 → predict scores it on smoothing alone);
    // an inner join would silently delete the class from the model
    val labels = priors.join(totals, Seq("label"), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
    val kept = if (minCount > 1L) counts.filter(col("c") >= minCount) else counts
    NbModel(labels, kept, vocabSize, train.count())
  }

  /** Score `docs` against `model`, returning one row per doc:
    * (idCol, pred, n_tokens). Every doc gets a prediction — a doc with
    * no tokens (or only unseen tokens) falls back to the prior/
    * unseen-mass argmax. */
  def naiveBayesPredict(docs: DataFrame, model: NbModel,
                        idCol: String, textCol: String): DataFrame = {
    val labels = broadcast(model.labels)
    val v = lit(model.vocabSize.toDouble)
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    // token-occurrence log-likelihood per (doc, label); unseen tokens
    // hit the left-join null and contribute ln(1 / (n_l + |V|))
    val ll = toks.crossJoin(labels.select("label", "n_tokens"))
      .join(model.tokenCounts, Seq("label", "tok"), "left")
      .withColumn("lp",
        log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
          (col("n_tokens").cast("double") + v)))
      .groupBy(col(idCol), col("label"))
      .agg(sum("lp").as("ll"), count(lit(1)).as("n_tok"))
    // every doc × every label, so token-free docs still score
    val scored = docs.select(col(idCol)).crossJoin(labels)
      .join(ll, Seq(idCol, "label"), "left")
      .withColumn("score",
        coalesce(col("ll"), lit(0.0)) +
          log(col("n_docs").cast("double") / lit(model.totalDocs.toDouble)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("label").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col(idCol), col("label").as("pred"),
        coalesce(col("n_tok"), lit(0L)).as("n_tokens"))
  }

  /** Train on the stable hash-split train slice, predict the rest —
    * the end-to-end shape `e3_nb_classifier` oracles. */
  def classifyHeldOut(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String, trainPerMyriad: Int = 9800): DataFrame = {
    val split = Mix.hashSplit(docs, idCol,
      Seq(("train", trainPerMyriad), ("heldout", 10000)))
    val model = naiveBayesTrain(
      split.filter(col("split") === "train"), textCol, labelCol)
    naiveBayesPredict(split.filter(col("split") === "heldout")
      .drop("split"), model, idCol, textCol)
  }
}
