package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring — the classic
  * perplexity-filter step of an LLM data pipeline (score every document
  * under a cheap n-gram LM trained on trusted text; drop the tail).
  * KenLM-shaped but deliberately minimal: MLE bigram probabilities, a
  * fixed floor for unseen bigrams — enough to rank documents by
  * fluency, fully declarative, and oracle-checkable.
  *
  * Scale shape: training is one explode + two partial-aggregations
  * (bigram counts, prefix counts — both map-side combinable); scoring
  * is an equi-join of exploded bigrams against the model (hash-
  * partitioned on the bigram; broadcast it when the vocabulary fits)
  * and a per-doc partial-agg. No step holds a document's text in
  * driver memory and nothing is quadratic.
  */
object LanguageModel {

  /** Penalty log-prob for bigrams unseen in training (~ln of a
    * vanishing probability): keeps scoring total and finite. */
  val UnseenLogProb: Double = math.log(1e-9)

  /** Typed bigram explosion: the Column-HOF formulation
    * (`transform(sequence(...), element_at(t, i))`) is interpreted and
    * re-evaluates the token array per element — a measured 10×+ cost on
    * the two hottest scans of this operator. Plain JVM loop instead
    * (the same escape hatch as shingleHashes3Typed). */
  private def explodeBigrams(df: DataFrame, idCol: Option[String], textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    idCol match {
      case Some(id) =>
        df.select(col(id).cast("long"), col(textCol).cast("string"))
          .as[(Long, String)]
          .flatMap { case (i, text) =>
            val t = text.split(" ").iterator.filter(_.nonEmpty).toArray
            (0 until t.length - 1).iterator.map(j => (i, t(j) + " " + t(j + 1)))
          }
          .toDF(id, "bigram")
      case None =>
        df.select(col(textCol).cast("string")).as[String]
          .flatMap { text =>
            val t = text.split(" ").iterator.filter(_.nonEmpty).toArray
            (0 until t.length - 1).iterator.map(j => t(j) + " " + t(j + 1))
          }
          .toDF("bigram")
    }
  }

  /** MLE bigram model from a training corpus: (bigram, p) where
    * p = c(w1 w2) / c(w1 ·). */
  def trainBigramModel(train: DataFrame, textCol: String): DataFrame = {
    val counts = explodeBigrams(train, None, textCol)
      .groupBy("bigram").agg(count(lit(1)).as("c2"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
    val prefix = counts.groupBy("w1").agg(sum("c2").as("c1"))
    counts.join(prefix, "w1")
      .select(col("bigram"), (col("c2").cast("double") / col("c1")).as("p"))
  }

  /** Per-document fluency under the model: (idCol, n_bigrams,
    * avg_logprob). Higher avg_logprob = more in-distribution text;
    * docs with fewer than two tokens have no bigrams and are omitted
    * (score them by length rules instead). */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                model: DataFrame): DataFrame =
    explodeBigrams(docs, Some(idCol), textCol)
      .join(model, Seq("bigram"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        avg(coalesce(log(col("p")), lit(UnseenLogProb))).as("avg_logprob"))
}
