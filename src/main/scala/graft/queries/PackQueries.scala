package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Mix, Pack, TextAnalysis}
import graft.sources.Tables

/** Training-layout operators over `documents`: sequence packing and
  * deterministic corpus splits (SURVEY §2.6 pipeline surface). */
object PackQueries {

  // GPT-style pack-and-split at 512-token context windows: docs
  // concatenated in id order, split at window boundaries. The Spark
  // side runs the two-phase distributed prefix sum (no global-order
  // window); the oracle is the plain windowed cumulative sum the
  // distributed scan must equal.
  private val pack = QueryDef("pk_sequence_pack", Some(
    """WITH t AS (SELECT doc_id,
      |             cast(len(list_filter(str_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
      |           FROM documents),
      |c AS (SELECT doc_id, n,
      |        coalesce(sum(n) OVER (ORDER BY doc_id
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |                 0)::BIGINT AS gs
      |      FROM t),
      |s AS (SELECT doc_id, n, gs FROM c WHERE n > 0),
      |seg AS (SELECT doc_id, n, gs,
      |          unnest(range(gs // 512, (gs + n - 1) // 512 + 1)) AS pack_id
      |        FROM s)
      |SELECT doc_id, pack_id,
      |       greatest(gs, pack_id * 512) - pack_id * 512 AS pack_pos,
      |       greatest(gs, pack_id * 512) - gs AS doc_off,
      |       least(gs + n, (pack_id + 1) * 512) - greatest(gs, pack_id * 512) AS seg_len
      |FROM seg""".stripMargin)) { (spark, dir) =>
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
    Pack.sequencePack(docs, "doc_id", "n", capacity = 512L)
  }

  // Stable hash-based train/val/test split (98/1/1): assignment is a
  // pure function of doc_id — survives reruns and incremental
  // ingestion, so eval membership never drifts into the train set.
  private val split = QueryDef("pk_hash_split", Some(
    """WITH m0 AS (SELECT doc_id, ((doc_id + 1) * 2654435761) % 4294967296 AS h
      |            FROM documents),
      |m1 AS (SELECT doc_id, (xor(h, h // 65536) * 40503) % 4294967296 AS h FROM m0),
      |m AS (SELECT doc_id, xor(h, h // 8192) % 10000 AS b FROM m1)
      |SELECT doc_id,
      |       CASE WHEN b < 9800 THEN 'train'
      |            WHEN b < 9900 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM m""".stripMargin), bench = false) { (spark, dir) =>
    Mix.hashSplit(Tables(spark, dir).documents.select(col("doc_id")), "doc_id",
      Seq(("train", 9800), ("val", 9900), ("test", 10000)))
  }

  // Reproducible token-budget slice: docs in avalanche-hash priority
  // order until 20k tokens. Same distributed prefix scan as packing;
  // oracle is the windowed cumsum it must equal.
  private val budget = QueryDef("pk_token_budget", Some(
    """WITH t AS (SELECT doc_id,
      |             cast(len(list_filter(str_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
      |           FROM documents),
      |m0 AS (SELECT doc_id, ((doc_id + 1) * 2654435761) % 4294967296 AS h FROM t),
      |m1 AS (SELECT doc_id, (xor(h, h // 65536) * 40503) % 4294967296 AS h FROM m0),
      |m AS (SELECT doc_id, xor(h, h // 8192) AS h FROM m1),
      |c AS (SELECT t.doc_id, t.n, m.h,
      |        coalesce(sum(t.n) OVER (ORDER BY m.h, t.doc_id
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |                 0)::BIGINT AS cb
      |      FROM t JOIN m USING (doc_id))
      |SELECT doc_id, n AS n_tokens, cb AS cum_before FROM c WHERE cb < 20000""".stripMargin)) {
    (spark, dir) =>
      val docs = Tables(spark, dir).documents
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      Pack.tokenBudgetSample(docs, "doc_id", "n", budget = 20000L)
  }

  // Per-source frequency cap (domain capping): at most 10 docs per
  // source, survivors chosen by hash priority — deterministic across
  // reruns. Runs through the bounded-heap GroupedTopK operator.
  private val cap = QueryDef("mx_source_cap", Some(
    """WITH m0 AS (SELECT doc_id, source,
      |              ((doc_id + 1) * 2654435761) % 4294967296 AS h FROM documents),
      |m1 AS (SELECT doc_id, source, (xor(h, h // 65536) * 40503) % 4294967296 AS h FROM m0),
      |m AS (SELECT doc_id, source, xor(h, h // 8192) AS h FROM m1),
      |r AS (SELECT doc_id, source,
      |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
      |      FROM m)
      |SELECT doc_id, source FROM r WHERE rn <= 10""".stripMargin), bench = false) {
    (spark, dir) =>
      Mix.capPerStratum(
        Tables(spark, dir).documents.select(col("doc_id"), col("source")),
        "doc_id", "source", cap = 10)
        .select("doc_id", "source")
  }

  // Dense gap-free ids in doc_id order via the distributed prefix
  // scan — the numbering monotonically_increasing_id can't give and a
  // row_number window would single-partition.
  private val dense = QueryDef("pk_dense_ids", Some(
    """SELECT doc_id,
      |       cast(row_number() OVER (ORDER BY doc_id) AS BIGINT) - 1 AS dense_id
      |FROM documents""".stripMargin), bench = false) { (spark, dir) =>
    Pack.denseIds(Tables(spark, dir).documents.select(col("doc_id")), "doc_id")
  }

  // Context-window chunking with overlap (chunk 16 words, stride 12):
  // the RAG/long-doc layout where chunks never cross doc boundaries and
  // consecutive chunks share 4 words. The oracle replays the chunk-count
  // closed form and the 1-based list slicing in SQL.
  private val chunk = QueryDef("pk_chunk", Some(
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |n AS (SELECT doc_id, ws, len(ws) AS len,
      |             CASE WHEN len(ws) <= 16 THEN 1
      |                  ELSE 1 + (len(ws) - 16 + 11) // 12 END AS nc
      |      FROM w),
      |c AS (SELECT doc_id, ws, len, unnest(range(0, nc)) AS i FROM n)
      |SELECT doc_id, cast(i AS INT) AS chunk_idx,
      |       array_to_string(ws[i*12+1:least(i*12+16, len)], ' ') AS chunk_text,
      |       cast(least(i*12+16, len) - i*12 AS BIGINT) AS n_words
      |FROM c""".stripMargin)) { (spark, dir) =>
    Pack.chunkWindows(Tables(spark, dir).documents, "doc_id", "text",
      chunkWords = 16, overlapWords = 4)
  }

  // Deterministic epoch shuffle (seed 1): global training-order
  // permutation by seeded avalanche hash, dense positions 0…N−1 via the
  // distributed prefix scan. The oracle is the single row_number()
  // window the scan must equal.
  private val shuffle = QueryDef("pk_shuffle", Some(
    """WITH m0 AS (SELECT doc_id, ((doc_id + 2) * 2654435761) % 4294967296 AS h
      |            FROM documents),
      |m1 AS (SELECT doc_id, (xor(h, h // 65536) * 40503) % 4294967296 AS h FROM m0),
      |m AS (SELECT doc_id, xor(h, h // 8192) AS h FROM m1)
      |SELECT doc_id,
      |       cast(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) - 1 AS shuffle_pos
      |FROM m""".stripMargin)) { (spark, dir) =>
    Pack.epochShuffle(Tables(spark, dir).documents.select(col("doc_id")),
      "doc_id", seed = 1L)
  }

  // Temperature-flattened language mixing (α = 0.5): shares follow
  // sqrt(count), lifting tail languages — exact integer targets
  // (floor∘sqrt is IEEE-correctly-rounded on both sides, ÷ is integer
  // division), survivors by hash priority. en's 44% share flattens to
  // ~35% on this corpus; every step replays in SQL.
  private val temperature = QueryDef("mx_temperature", Some(
    """WITH c AS (SELECT lang, count(*)::BIGINT AS c FROM documents GROUP BY 1),
      |w AS (SELECT lang, c, cast(floor(sqrt(c)) AS BIGINT) AS w FROM c),
      |tot AS (SELECT sum(c)::BIGINT AS n, sum(w)::BIGINT AS sw FROM w),
      |t AS (SELECT lang, least(c, (tot.n * w.w) // tot.sw) AS t FROM w, tot),
      |m0 AS (SELECT doc_id, lang, ((doc_id + 1) * 2654435761) % 4294967296 AS h
      |       FROM documents),
      |m1 AS (SELECT doc_id, lang, (xor(h, h // 65536) * 40503) % 4294967296 AS h FROM m0),
      |m AS (SELECT doc_id, lang, xor(h, h // 8192) AS h FROM m1),
      |r AS (SELECT doc_id, lang,
      |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
      |      FROM m)
      |SELECT doc_id, lang FROM r JOIN t USING (lang) WHERE rn <= t.t""".stripMargin)) {
    (spark, dir) =>
      Mix.temperatureSample(
        Tables(spark, dir).documents.select(col("doc_id"), col("lang")),
        "doc_id", "lang")
  }

  // Weighted sampling without replacement (Efraimidis–Spirakis):
  // longer documents proportionally likelier, membership a pure
  // function of (doc_id, seed). The priority key ln(u)/w replays in
  // SQL exactly: u from the mix32 avalanche chain (division by 2³² is
  // exact), ln the txt_tfidf-proven cross-engine op, and only the
  // top-n SELECTION must agree — ties broken by doc_id.
  private val weighted = QueryDef("mx_weighted", Some(
    """WITH m0 AS (SELECT doc_id, n_chars,
      |              ((doc_id + 1) * 2654435761) % 4294967296 AS h
      |            FROM documents),
      |m1 AS (SELECT doc_id, n_chars, (xor(h, h // 65536) * 40503) % 4294967296 AS h FROM m0),
      |m AS (SELECT doc_id, n_chars, xor(h, h // 8192) AS h FROM m1),
      |k AS (SELECT doc_id, n_chars,
      |        ln((h + 1) / 4294967296.0) / CAST(n_chars AS DOUBLE) AS key
      |      FROM m WHERE n_chars > 0)
      |SELECT doc_id, n_chars FROM k ORDER BY key DESC, doc_id LIMIT 100""".stripMargin)) {
    (spark, dir) =>
      Mix.weightedSample(
        Tables(spark, dir).documents.select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", 100)
  }

  val defs: Seq[QueryDef] = Seq(pack, split, budget, cap, dense, chunk, shuffle,
    temperature, weighted)
}
