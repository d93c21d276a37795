package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016; the GPT-2
  * greedy-rank encoder): learn a merge table from the corpus, then
  * tokenize with it — the real subword tokenizer a training-data
  * pipeline runs, not a token-count heuristic.
  *
  * Scale shape: training never touches the corpus after the first
  * pass — it runs on the WORD-FREQUENCY DICT (`groupBy(word).count`),
  * which Zipf shrinks by orders of magnitude, prunable further with
  * `minWordFreq` (hapaxes can't win a merge vote anyway when a real
  * vocab size is in play). Each merge round is one map-side-combinable
  * pair-count aggregation over the dict plus a `limit(1)` winner
  * collect — driver state is the merge list itself (the model, like
  * IVF's centroids), never data. The dict Dataset is re-persisted each
  * round and lineage-cut periodically, so round N costs O(|dict|),
  * not O(N·|dict|). Encoding is embarrassingly parallel: broadcast
  * merge ranks + a per-partition word→tokens memo (Zipf again: the
  * memo hit-rate IS the token distribution).
  *
  * Determinism: the winning pair is (count DESC, pair ASC) — total
  * order, so training is partition-invariant and reruns reproduce the
  * exact table. Not SQL-expressible (data-dependent iteration), so the
  * `txt_bpe` query is rows-only; the specs instead pin the algorithm
  * to a single-threaded reference implementation on real corpora.
  */
object Bpe {

  /** Merge all occurrences of `pair` in `syms`, left to right. */
  private[ops] def applyMerge(syms: List[String], pair: (String, String)): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) {
      rest match {
        case a :: b :: tail if a == pair._1 && b == pair._2 =>
          out += a + b; rest = tail
        case a :: tail =>
          out += a; rest = tail
      }
    }
    out.result()
  }

  /** Learn `numMerges` merges from whitespace words of `textCol`.
    * Returns the ordered merge table (rank = position). Stops early
    * when no adjacent pair occurs twice. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minWordFreq: Long = 1L): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var dict: Dataset[(List[String], Long)] = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minWordFreq)
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString).toList, f) }
      .persist()
    dict.count() // materialize before the loop so round 1 starts from a cache
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var prev = dict
    var sinceCheckpoint = 0
    try {
      var continue = true
      while (continue && merges.length < numMerges) {
        val best = dict.flatMap { case (syms, f) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, f))
        }.toDF("a", "b", "f")
          .groupBy("a", "b").agg(sum("f").as("cnt"))
          .orderBy(desc("cnt"), asc("a"), asc("b"))
          .limit(1).as[(String, String, Long)].collect()
        best.headOption.filter(_._3 >= 2L) match {
          case None => continue = false
          case Some((a, b, _)) =>
            merges += ((a, b))
            val pair = (a, b)
            val next = dict.map { case (syms, f) =>
              (if (syms.length < 2) syms else applyMerge(syms, pair), f)
            }.persist()
            sinceCheckpoint += 1
            // cut lineage so round N doesn't replay N map stages
            val materialized = if (sinceCheckpoint >= 16) {
              sinceCheckpoint = 0; next.localCheckpoint(true)
            } else { next.count(); next }
            prev.unpersist()
            prev = next
            dict = materialized
        }
      }
      merges.toList
    } finally prev.unpersist()
  }

  /** GPT-2-style greedy encode of one word: repeatedly merge the
    * lowest-rank adjacent pair until none remains ranked. */
  private[ops] def encodeWord(word: String,
                              ranks: Map[(String, String), Int]): List[String] = {
    var syms: List[String] = word.map(_.toString).toList
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var rest = syms
      while (rest.nonEmpty && rest.tail.nonEmpty) {
        val p = (rest.head, rest.tail.head)
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = p }
        rest = rest.tail
      }
      if (bestPair == null) done = true
      else {
        syms = applyMerge(syms, bestPair)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Tokenize `textCol` with a trained merge table: one narrow
    * mapPartitions, merge ranks broadcast, per-partition word memo. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks = ranksB.value
        val memo = scala.collection.mutable.HashMap.empty[String, List[String]]
        it.map { case (id, text) =>
          val ws = if (text == null) Array.empty[String] else text.split(" ")
          val toks = ws.iterator.filter(_.nonEmpty).flatMap { w =>
            memo.getOrElseUpdate(w, encodeWord(w, ranks))
          }.toSeq
          (id, toks)
        }
      }.toDF(idCol, "bpe_tokens")
  }
}
