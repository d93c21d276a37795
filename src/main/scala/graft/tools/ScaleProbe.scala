package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe: pushes ~10M synthetic events (DSv2 source, 64 splits)
  * through the engine's heavier operator shapes to validate the plans
  * at ~100x the sf0.1 events volume: windowed agg, sessionization,
  * as-of join, grouped top-k. Prints one timing line per stage.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = graft.Engine.session("scale-probe")
    val ev = spark.read.format("synthetic-events")
      .option("rows", rows).option("numPartitions", 64).load()
      .withColumn("ts_ns", unix_micros(col("ts")) * 1000)

    def stage(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }

    stage("window_agg") {
      ev.groupBy((expr("ts_ns div 600000000000") * 600).as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("v"))
    }
    stage("sessionize") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      ev.withColumn("new_s",
          when(col("ts_ns") - lag("ts_ns", 1).over(w) > 1800000000000L
            || lag("ts_ns", 1).over(w).isNull, 1).otherwise(0))
        .withColumn("sid", sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
    }
    stage("asof_join") {
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts_ns").agg(max("event_id").as("pid"))
        .withColumn("pts", col("ts_ns"))
      graft.ops.TemporalJoins.asofJoin(
        ev.select("event_id", "user_id", "ts_ns"), purchases, "user_id", "ts_ns", Seq("pid", "pts"))
    }
    stage("grouped_topk") {
      graft.plans.GroupedTopK(
        ev.select("user_id", "event_id", "value"), Seq("user_id"), 5,
        Seq(("value", true), ("event_id", false)))
    }

    // E1 at 20x volume: replicate sf0.1 documents (~100k docs) with
    // per-replica perturbation, then MinHash-LSH near-dups + duplicate
    // clusters. Validates the no-all-pairs claim: runtime must track the
    // candidate count (clusters of ~20 replicas), not |docs|².
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._
    val shingled = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .crossJoin(spark.range(20).select(col("id").as("rep")))
      .select((col("doc_id") * 20 + col("rep")).as("doc_id"),
        when(col("rep") % 3 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("rep"))).as("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, graft.ops.TextAnalysis.shingleHashes3Typed(t)) }
      .toDF("doc_id", "sh")
      .localCheckpoint()
    stage("minhash_docs_20x") {
      graft.ops.Dedup.minhashNearDups(shingled, "doc_id", "sh", threshold = 0.5)
    }
    stage("dup_clusters_20x") {
      val pairs = graft.ops.Dedup
        .minhashNearDups(shingled, "doc_id", "sh", threshold = 0.5)
        .select("id_a", "id_b")
      graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b")
    }

    // Embedding near-dup at 25x input volume (50k vectors), composed the
    // way a real pipeline must be: exact-dedup FIRST, then sign-LSH
    // blocked near-dup over the distinct vectors. Measured here: skipping
    // the dedup step lets exact-duplicate clusters multiply every bucket
    // collision by cluster² (25M candidate pairs and a multi-GB array
    // shuffle, ~600s) — with it the same input verifies in seconds.
    // Bucket count must also scale with the corpus: P ≈ log2(n) planes
    // per table (P=12 → 4096 buckets, vs the query default P=8 sized for
    // 500–2000 rows).
    val emb25 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
      .crossJoin(spark.range(25).select(col("id").as("rep")))
      .select((col("vec_id") * 25 + col("rep")).as("vec_id"), col("embedding"))
      .localCheckpoint()
    stage("embed_dedup_neardup_25x") {
      val distinctVecs = emb25.groupBy(col("embedding"))
        .agg(min("vec_id").as("vec_id"))
        .select("vec_id", "embedding")
      graft.ops.Dedup.embedNearDups(distinctVecs, threshold = 0.4, planesPerTable = 12)
    }

    // Contamination at 20x docs vs a ~1k-doc eval set: broadcast
    // inverted-index join; cost tracks matching n-grams, not
    // |train| x |eval|.
    val docs20 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .crossJoin(spark.range(20).select(col("id").as("rep")))
      .select((col("doc_id") * 20 + col("rep")).as("doc_id"), col("text"))
    stage("contamination_20x") {
      graft.ops.Contamination.overlapReport(
        docs20.filter(col("doc_id") % 97 =!= 0),
        docs20.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", minHits = 3L)
    }
    spark.stop()
  }
}
