package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** End-to-end training-data pipeline over the fixture tables — the
  * composed "what a user of the engine runs" demo:
  *
  *   documents → quality filter → LM fluency filter → exact dedup →
  *   near-dup removal (MinHash-LSH) → benchmark decontamination →
  *   join to embeddings (doc_id ≡ vec_id in fixtures) → ANN
  *   self-similarity scan for leakage candidates → domain caps →
  *   stable train/val/test split → sequence packing for the trainer.
  *
  * Every stage is one of the library's public operators; the pipeline
  * is a single lazy plan per stage group (no driver-side loops), so it
  * scales exactly as its constituent operators do.
  */
object PipelineDemo {

  case class Result(kept: DataFrame, nearDupPairs: DataFrame,
                    contaminated: DataFrame, leakage: DataFrame,
                    split: DataFrame, packs: DataFrame)

  def run(spark: SparkSession, dir: String): Result = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents

    // 1. quality gate: keep docs with a minimum quality score
    val scored = docs.withColumn("score", TextAnalysis.qualityScore(col("text")))
    val quality = scored.filter(col("score") >= 0.3)

    // 2. LM fluency filter: bigram model trained on the quality-passing
    //    corpus itself; drop the most out-of-distribution tail
    val model = graft.ops.LanguageModel.trainBigramModel(quality, "text")
    val fluent = quality.join(
      graft.ops.LanguageModel.scoreDocs(quality, "doc_id", "text", model)
        .filter(col("avg_logprob") >= -15.0)
        .select("doc_id"),
      "doc_id")

    // 3. exact dedup by content
    val exact = Dedup.exactByKey(fluent, "text", "doc_id")

    // 4. near-dup removal: drop the higher doc_id of every verified pair
    val shingled = exact.select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) => (id, TextAnalysis.shingleHashes3Typed(text)) }
      .toDF("doc_id", "sh")
    val pairs = Dedup.minhashNearDups(shingled, "doc_id", "sh", threshold = 0.5)
    val dropIds = pairs.select(col("id_b").as("doc_id")).distinct()
    val deduped = exact.join(dropIds, Seq("doc_id"), "left_anti")

    // 5. benchmark decontamination: drop docs sharing >= 5 verbatim
    //    trigrams with the stand-in eval set (doc_id % 101 == 0 docs)
    val benchmark = docs.filter(col("doc_id") % 101 === 0)
    val contaminated = graft.ops.Contamination.contaminatedIds(
      deduped, benchmark, "doc_id", "text", minHits = 5L)
      .filter(col("doc_id") % 101 =!= 0) // the eval docs themselves aside
    val kept = deduped.join(contaminated, Seq("doc_id"), "left_anti")

    // 6. attach embeddings and scan for near-identical vectors among the
    //    kept docs (train/eval leakage candidates)
    val emb = Tables(spark, dir).embeddings
      .join(kept.select(col("doc_id").as("vec_id")), "vec_id")
    val leakage = Similarity.annTopK(emb, emb, k = 1)
      .filter(col("cos") >= 0.99)

    // 7. layout for the trainer: per-source domain caps, a stable
    //    train/val/test split, then the train slice packed into
    //    1024-token context windows
    val capped = graft.ops.Mix.capPerStratum(
      kept.join(docs.select("doc_id", "source"), "doc_id"), // source dropped by dedup
      "doc_id", "source", cap = 1000)
    val split = graft.ops.Mix.hashSplit(capped, "doc_id",
      Seq(("train", 9800), ("val", 9900), ("test", 10000)))
    val packs = graft.ops.Pack.sequencePack(
      split.filter(col("split") === "train")
        .withColumn("n", TextAnalysis.tokenCount(col("text"))),
      "doc_id", "n", capacity = 1024L)

    Result(kept, pairs, contaminated, leakage, split, packs)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Engine.session("pipeline-demo")
    val r = run(spark, dir)
    println(s"kept=${r.kept.count()} nearDupPairs=${r.nearDupPairs.count()} " +
      s"contaminated=${r.contaminated.count()} leakage=${r.leakage.count()} " +
      s"trainPacks=${r.packs.select("pack_id").distinct().count()}")
    spark.stop()
  }
}
