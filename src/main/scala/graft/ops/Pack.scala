package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM pretraining (the layout step between a
  * cleaned corpus and the trainer): documents are concatenated in
  * ascending id order and SPLIT at fixed context-window boundaries of
  * `capacity` tokens — the classic pack-and-split layout, where a
  * window may end mid-document and the remainder flows into the next
  * window. Output: one row per (document × context window) segment.
  *
  * Scale shape — the interesting part is the GLOBAL prefix sum over
  * token counts. A window over a global ORDER BY would funnel the
  * whole corpus through one partition; instead this runs the classic
  * two-phase distributed scan:
  *   1. range-partition by id + sort within partitions (the shuffle a
  *      global sort needs anyway, but parallel end-to-end),
  *   2. one narrow pass summing each partition's tokens (P longs to
  *      the driver),
  *   3. one narrow pass re-walking each partition with its exclusive
  *      prefix offset, emitting segments directly.
  * The result is independent of partition count/boundaries — the
  * prefix offsets absorb them — so the operator is deterministic and
  * mirrorable by a plain windowed cumulative sum in the SQL oracle.
  *
  * Segment arithmetic is pure integer: a doc spanning global tokens
  * [gs, gs+n) intersects packs gs/cap … (gs+n-1)/cap; within pack p it
  * occupies pack positions [max(gs, p·cap), min(gs+n, (p+1)·cap)) − p·cap.
  * Empty docs (0 tokens) produce no segments.
  */
object Pack {

  /** The shared two-phase distributed prefix scan: rows as (id, value)
    * sorted by `sortCols` within range partitions, re-walked with each
    * partition's exclusive prefix offset. `emit(id, value, prefixBefore)`
    * produces the output rows. The per-partition imperative walk is the
    * one shape Dataset ops can't express (mapPartitions loses the
    * partition index), hence the RDD drop-down; the shuffle is the one
    * range exchange, reused across both passes. */
  private def prefixScan(df: DataFrame, sortCols: Seq[String], p: Int)(
      emit: (Long, Long, Long) => Iterator[Row]): org.apache.spark.rdd.RDD[Row] = {
    val parts = df
      .repartitionByRange(p, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    val rdd = parts.queryExecution.toRdd.mapPartitions(
      it => it.map(r => (r.getLong(0), r.getLong(1))), preservesPartitioning = true)
    val totals = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator.single((i, s))
      }
      .collect().toMap // P longs of model state, not data
    val nParts = totals.keys.maxOption.getOrElse(-1) + 1
    val offsets = Array.tabulate(nParts)(identity)
      .scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L)) // exclusive prefix
    rdd.mapPartitionsWithIndex { case (i, it) =>
      var g = offsets(i)
      it.flatMap { case (id, n) =>
        val before = g
        g += n
        emit(id, n, before)
      }
    }
  }

  /** (doc_id, pack_id, pack_pos, doc_off, seg_len) for every segment.
    * `tokensCol` must be a non-negative integral token count. */
  def sequencePack(docs: DataFrame, idCol: String, tokensCol: String,
                   capacity: Long, numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, "pack capacity must be positive")
    val spark = docs.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val segs = prefixScan(
      docs.select(col(idCol).cast("long").as("doc_id"),
        col(tokensCol).cast("long").as("n")),
      Seq("doc_id"), p) { (id, n, gs) =>
      if (n <= 0) Iterator.empty
      else (gs / capacity to (gs + n - 1) / capacity).iterator.map { pk =>
        val segStart = math.max(gs, pk * capacity)
        val segEnd = math.min(gs + n, (pk + 1) * capacity)
        Row(id, pk, segStart - pk * capacity, segStart - gs, segEnd - segStart)
      }
    }
    spark.createDataFrame(segs, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_pos", LongType, nullable = false),
      StructField("doc_off", LongType, nullable = false),
      StructField("seg_len", LongType, nullable = false))))
  }

  /** Dense contiguous row ids 0…N−1 in ascending `orderCol` order — the
    * gap-free numbering `monotonically_increasing_id` does NOT give
    * (it strides by partition) and a `row_number()` window only gives
    * through a single-partition sort. Same two-phase scan with value=1:
    * the prefix count IS the id. The "assign every training example a
    * stable dense index" step. Output: (orderCol, dense_id). */
  def denseIds(df: DataFrame, orderCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rows = prefixScan(
      df.select(col(orderCol).cast("long").as("id"), lit(1L).as("one")),
      Seq("id"), p) { (id, _, before) => Iterator.single(Row(id, before)) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField(orderCol, LongType, nullable = false),
      StructField("dense_id", LongType, nullable = false))))
  }

  /** Deterministic token-budget subsample: documents are ranked by an
    * avalanche hash of their id (a reproducible shuffle — no RNG state,
    * stable under reruns and incremental ingestion) and taken in that
    * order until the global token budget is reached: a doc is kept iff
    * the tokens BEFORE it in priority order are < `budget` ("take
    * until full", so the last doc may overshoot). The "give me a 50B-
    * token slice of this 5T-token corpus, reproducibly" step.
    *
    * Same two-phase distributed prefix scan as [[sequencePack]], keyed
    * by (hash, id) — no global-order window, partition-boundary
    * independent. Output: (doc_id, n_tokens, cum_before). */
  def tokenBudgetSample(docs: DataFrame, idCol: String, tokensCol: String,
                        budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = docs.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val kept = prefixScan(
      docs.select(col(idCol).cast("long").as("doc_id"),
        col(tokensCol).cast("long").as("n"),
        Mix.mix32Col(col(idCol)).as("h")),
      Seq("h", "doc_id"), p) { (id, n, before) =>
      if (before < budget) Iterator.single(Row(id, n, before)) else Iterator.empty
    }
    spark.createDataFrame(kept, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("cum_before", LongType, nullable = false))))
  }

  /** Deterministic epoch shuffle: every row gets a dense position
    * 0…N−1 in ascending (hash(seed, id), id) order — the global
    * training-order permutation a dataloader consumes each epoch.
    * Hash-derived (no RNG state), so the order is reproducible across
    * reruns and machines, a different `seed` gives an independent
    * permutation for the next epoch, and late-arriving rows don't
    * displace existing positions except where they hash between them.
    *
    * Same two-phase distributed prefix scan as [[denseIds]] — the only
    * shuffle is one range exchange on the hash key; no global-order
    * window, no single-partition funnel, positions independent of
    * partitioning. Output: (idCol, shuffle_pos). */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
                   numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rows = prefixScan(
      df.select(col(idCol).cast("long").as("id"), lit(1L).as("one"),
        Mix.mix32Col(col(idCol), seed).as("h")),
      Seq("h", "id"), p) { (id, _, before) => Iterator.single(Row(id, before)) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("shuffle_pos", LongType, nullable = false))))
  }

  /** Context-window chunking with overlap: each doc's word sequence is
    * split into chunks of `chunkWords`, consecutive chunks sharing
    * `overlapWords` (stride = chunk − overlap) — the RAG/long-doc
    * preprocessing step sequencePack's concat-everything layout is not
    * (chunks never cross doc boundaries; overlap preserves context at
    * the seams). Chunks start at i·stride while that is a fresh start
    * inside the doc; the final chunk is the first one whose end reaches
    * the doc's end (so a doc never yields a chunk that adds no new
    * words). Narrow typed flatMap — per-doc JVM loop, zero shuffle,
    * embarrassingly parallel at any corpus size.
    *
    * Output: (idCol, chunk_idx, chunk_text, n_words). */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   chunkWords: Int, overlapWords: Int): DataFrame = {
    require(chunkWords > 0 && overlapWords >= 0 && overlapWords < chunkWords,
      "need 0 <= overlap < chunk")
    val spark = docs.sparkSession
    import spark.implicits._
    val stride = chunkWords - overlapWords
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val words = if (text == null) Array.empty[String] else text.split(' ')
        val len = words.length
        // chunks i = 0 .. nc-1, start = i*stride; last chunk = first
        // whose end (start + chunkWords) covers len
        val nc = if (len <= chunkWords) 1
                 else 1 + (len - chunkWords + stride - 1) / stride
        (0 until nc).iterator.map { i =>
          val s = i * stride
          val e = math.min(s + chunkWords, len)
          (id, i, words.slice(s, e).mkString(" "), (e - s).toLong)
        }
      }
      .toDF(idCol, "chunk_idx", "chunk_text", "n_words")
  }

  /** Per-pack fill report over [[sequencePack]] output: (pack_id,
    * n_segments, n_tokens, fill_ratio). Every pack but the last is
    * exactly full by construction — the report is the validation a
    * pipeline runs before shipping packs to the trainer. */
  def packReport(segments: DataFrame, capacity: Long): DataFrame =
    segments.groupBy("pack_id")
      .agg(count(lit(1)).as("n_segments"), sum("seg_len").as("n_tokens"))
      .withColumn("fill_ratio", col("n_tokens").cast("double") / capacity.toDouble)
}
