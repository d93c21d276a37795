package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — an LLM-data-pipeline operator beyond the
  * reference's documented surface (SURVEY §2.6 family): find training
  * documents that share verbatim word n-grams with an eval/benchmark
  * set, so they can be dropped before training (the standard defense
  * against test-set leakage inflating benchmark scores).
  *
  * Scale shape: both sides explode to distinct trigram hashes (typed
  * JVM loop — see shingleHashes3Typed on why not a Column HOF), then an
  * equi-join on the hash with the eval side broadcast (benchmark sets
  * are tiny next to a training corpus), partial-aggregated counts per
  * (train doc, eval doc). Inverted-index, never all-pairs: a training
  * doc sharing no n-gram with any eval doc never leaves its mapper.
  */
object Contamination {

  /** (doc_id, eval_id, n_shared): training × eval pairs sharing at
    * least `minHits` distinct word trigrams. */
  def overlapReport(train: DataFrame, evalSet: DataFrame,
                    idCol: String, textCol: String,
                    minHits: Long = 1L): DataFrame = {
    def grams(df: DataFrame, as: String) = {
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col(idCol).cast("long"), col(textCol).cast("string"))
        .as[(Long, String)]
        .flatMap { case (id, t) => TextAnalysis.shingleHashes3Typed(t).map(h => (id, h)) }
        .toDF(as, "gram")
    }
    grams(train, "doc_id")
      .join(broadcast(grams(evalSet, "eval_id")), "gram")
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minHits)
  }

  /** The drop list: training doc ids with ANY qualifying eval overlap. */
  def contaminatedIds(train: DataFrame, evalSet: DataFrame,
                      idCol: String, textCol: String,
                      minHits: Long = 1L): DataFrame =
    overlapReport(train, evalSet, idCol, textCol, minHits)
      .select("doc_id").distinct()
}
