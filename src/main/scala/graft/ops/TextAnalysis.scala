package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM-data pipelines (SURVEY §2.6 E3):
  * tokenization, n-gram shingling, language-ID heuristic, quality
  * scoring, document fingerprinting.
  *
  * Everything is a Catalyst `Column` built from codegen'd builtins
  * (`split`/`filter`/`transform`/`aggregate`) — no UDFs, so whole-stage
  * codegen fuses these into the scan pipeline and they scale linearly
  * with no shuffle. The reference's model (every operator is a user
  * function, flink_arch.drawio page "DataStream分析") maps to these
  * declarative expressions instead of opaque closures.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Corpus text normalization — the first pass of every training-data
    * pipeline: strip control characters (keep \n\t), collapse runs of
    * whitespace to single spaces, trim. All codegen'd builtin regexps;
    * dedup/shingling downstream then sees canonical text, so
    * whitespace-only variants hash identically. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " "))

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Okapi BM25 ranked retrieval — "which documents answer this query"
    * at corpus scale (contamination checks and eval-set retrieval both
    * need it; the tf-idf scorer's production-grade sibling). One
    * tokenize pass; the query's terms filter the postings BEFORE any
    * shuffle, so only matching (doc, term) pairs aggregate; df and the
    * corpus stats are kilobyte frames broadcast back; top-k by
    * (score desc, doc_id) is TakeOrderedAndProject, never a global
    * sort. Scoring uses the always-positive idf
    * `ln(1 + (N − df + 0.5)/(df + 0.5))` with standard k1/b defaults.
    * Determinism contract (the oracle hash-checks this end-to-end):
    * each (doc, term) score is ONE fixed-association double expression
    * — mirrored literally in the DuckDB oracle, the txt_tfidf
    * precedent — and is rounded to 1e-9 fixed point BEFORE the per-doc
    * sum, so aggregation order cannot smear last-ulp differences into
    * the ranking. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "TextAnalysis.bm25TopK: no query terms")
    require(k > 0, "TextAnalysis.bm25TopK: k must be positive")
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val qtok = tok.where(col("term").isin(queryTerms: _*))
    bm25ScorePairs(tok, qtok, k1, b)
      .groupBy("doc_id")
      .agg((sum("s_fp") / lit(1e9)).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** The one BM25 arithmetic, applied to a frame carrying
    * (tf, df, dl, n_docs, tot_dl): every caller — fresh corpus pass or
    * persisted index — goes through THIS function, so the score of a
    * (doc, term) pair is bit-identical however its integer inputs were
    * obtained. One fixed-association double expression, 1e-9 fixed
    * point before any sum. */
  private def bm25Score(df: DataFrame, k1: Double, b: Double): DataFrame =
    df.withColumn("avgdl",
        col("tot_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("s",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .withColumn("s_fp", round(col("s") * lit(1e9)).cast("long"))

  /** Per-(doc, term) fixed-point BM25 scores — the shared core of
    * [[bm25TopK]] and [[bm25BatchTopK]]: tf over the PRE-FILTERED
    * postings, df and corpus stats as broadcast kilobyte frames.
    * `tok` is the full (doc_id, term) stream (doc lengths are BM25's
    * normalization term — inherently a full pass), `qtok` its rows
    * matching any query term. */
  private def bm25ScorePairs(tok: DataFrame, qtok: DataFrame,
                             k1: Double, b: Double): DataFrame = {
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl"))
    val tf = qtok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dft = qtok.groupBy("term").agg(countDistinct("doc_id").as("df"))
    bm25Score(
      tf.join(broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats)),
      k1, b)
  }

  /** Fan per-(doc, term) `s_fp` scores out to queries and take top-k
    * per query — the shared tail of [[bm25BatchTopK]] and
    * [[bm25SearchIndexed]]. */
  private def bm25TopKPerQuery(scored: DataFrame, q: DataFrame,
                               k: Int): DataFrame =
    scored.join(broadcast(q), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg((sum("s_fp") / lit(1e9)).as("score"), count(lit(1)).as("n_terms"))
      .transform(graft.plans.GroupedTopK(_, Seq("query_id"), k,
        Seq(("score", true), ("doc_id", false))))

  /** Build a PERSISTED BM25 inverted index — tokenize the corpus ONCE,
    * serve retrieval forever (the train-once/serve-forever symmetry
    * [[Similarity.ivfPqBuild]] gives ANN). Layout under `dir`:
    * `postings` (term, doc_id, tf, dl) — dl DENORMALIZED into the
    * posting row, so a search never joins the corpus-sized doc-length
    * table; `df` (term, df); `stats` (n_docs, tot_dl — one row).
    * `nFiles > 0` range-clusters postings by term and sorts within
    * files, so a term lookup's parquet min/max prunes to ~1 file — the
    * layout is the index. All stored fields are integers, which is
    * what makes [[bm25SearchIndexed]] bit-identical to the fresh
    * corpus pass (spec-pinned). Append-only corpora refresh
    * incrementally with [[bm25IndexUpdate]]. */
  def bm25IndexBuild(docs: DataFrame, idCol: String, textCol: String,
                     dir: String, nFiles: Int = 0): Unit = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val postings = tf.join(dl, "doc_id").select("term", "doc_id", "tf", "dl")
    val clustered =
      if (nFiles > 0) postings.repartitionByRange(nFiles, col("term"))
        .sortWithinPartitions("term", "doc_id")
      else postings
    clustered.write.mode("overwrite").parquet(s"$dir/postings")
    // tf is one row per (doc, term), so its per-term row count IS df —
    // derived from the same aggregate the postings were, never diverges
    tf.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/df")
    dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Batch retrieval off a RELOADED [[bm25IndexBuild]] index — no
    * tokenize pass, no corpus scan: the term IN-list is pushed into
    * the postings parquet (term-clustered files prune by min/max), df
    * and stats load as broadcast kilobyte frames, and the score
    * arithmetic is the same [[bm25Score]] every other form runs — so
    * the ranking is bit-identical to [[bm25BatchTopK]] over the
    * original corpus (spec-pinned). `maxTerms` bounds the pushed
    * IN-list (past it, probing degrades to a scan-shaped filter that
    * is still correct). */
  def bm25SearchIndexed(spark: org.apache.spark.sql.SparkSession,
                        dir: String, queries: DataFrame, k: Int,
                        k1: Double = 1.2, b: Double = 0.75,
                        maxTerms: Int = 4096): DataFrame = {
    require(k > 0, "TextAnalysis.bm25SearchIndexed: k must be positive")
    // the query frame is small by contract (thousands of terms, not a
    // corpus) — collect the term set so the filter PUSHES DOWN to the
    // postings scan and term-clustered files are skipped outright
    val (q, terms) = bm25QueryTerms(queries, maxTerms,
      "TextAnalysis.bm25SearchIndexed")
    val postings = spark.read.parquet(s"$dir/postings")
      .where(col("term").isin(terms: _*))
    val dft = spark.read.parquet(s"$dir/df")
      .where(col("term").isin(terms: _*))
    val stats = spark.read.parquet(s"$dir/stats")
    bm25SearchTables(postings, dft, stats, q, k, k1, b)
  }

  /** The table-shaped search core shared by [[bm25SearchIndexed]] and
    * the stream-maintained index ([[graft.streaming.Streams
    * .bm25SearchMaintained]]): postings (term, doc_id, tf, dl) already
    * filtered to the query's terms, per-term df, the one-row stats
    * frame, and the (query_id, term) frame. */
  private[graft] def bm25SearchTables(postings: DataFrame, dft: DataFrame,
                                      stats: DataFrame, q: DataFrame,
                                      k: Int, k1: Double,
                                      b: Double): DataFrame =
    bm25TopKPerQuery(
      bm25Score(
        postings.select("term", "doc_id", "tf", "dl")
          .join(broadcast(dft), "term").crossJoin(broadcast(stats)),
        k1, b),
      q, k)

  /** The (query_id, term) frame canonicalization + bounded term-set
    * collect shared by the indexed search paths: distinct non-null
    * rows, and the term UNION as a driver-side list so the filter
    * pushes into the postings scan. */
  private[graft] def bm25QueryTerms(queries: DataFrame, maxTerms: Int,
                                    who: String): (DataFrame, Seq[String]) = {
    require(queries.schema.length == 2,
      s"$who: queries must be a (query_id, term) frame")
    val q = queries.toDF("query_id", "term").na.drop().distinct()
    val terms = q.select("term").distinct().limit(maxTerms + 1)
      .collect().map(_.getString(0)).toSeq
    require(terms.nonEmpty, s"$who: no query terms")
    require(terms.length <= maxTerms,
      s"$who: over $maxTerms distinct terms — at that width run " +
        "bm25BatchTopK's scan-shaped path instead")
    (q, terms)
  }

  /** Incrementally extend a [[bm25IndexBuild]] index with NEW documents
    * (append-only corpora: doc_ids not already indexed — the caller's
    * contract, same as every other incremental refresh here). All
    * three tables merge by integer addition, so the refreshed index is
    * EXACTLY the full rebuild: new postings append (their rows carry
    * their own dl), per-term df adds (doc sets are disjoint), n_docs /
    * tot_dl add. One pass over only the new documents. */
  def bm25IndexUpdate(spark: org.apache.spark.sql.SparkSession,
                      dir: String, newDocs: DataFrame, idCol: String,
                      textCol: String): Unit = {
    val tok = newDocs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    tf.join(dl, "doc_id").select("term", "doc_id", "tf", "dl")
      .write.mode("append").parquet(s"$dir/postings")
    val mergedDf = spark.read.parquet(s"$dir/df")
      .unionByName(tf.groupBy("term").agg(count(lit(1)).as("df")))
      .groupBy("term").agg(sum("df").cast("long").as("df"))
    val mergedStats = spark.read.parquet(s"$dir/stats")
      .unionByName(dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl")))
      .agg(sum("n_docs").cast("long").as("n_docs"),
        sum("tot_dl").cast("long").as("tot_dl"))
    // small tables: materialize BEFORE overwriting what they read from
    val dfRows = mergedDf.localCheckpoint(true)
    val statRows = mergedStats.localCheckpoint(true)
    dfRows.write.mode("overwrite").parquet(s"$dir/df")
    statRows.write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Batch BM25 — thousands of queries in ONE corpus pass, the shape
    * contamination sweeps and eval-set mining actually run (per-query
    * [[bm25TopK]] would re-tokenize 100 TB per query). `queries` is a
    * two-column (query_id, term) frame; the UNION of all terms filters
    * the postings BEFORE any shuffle, so the fat path costs
    * |matching postings| — never |queries| · |corpus|. Per-(doc, term)
    * scores are computed ONCE (they don't depend on the query), then
    * fanned out to queries by a broadcast equi-join on term and summed
    * per (query_id, doc_id); top-k per query is one
    * [[graft.plans.GroupedTopK]] pass (bounded heaps, no global sort).
    * Same determinism contract as [[bm25TopK]]: identical score
    * arithmetic (shared code), 1e-9 fixed point before the sum,
    * (score desc, doc_id) tiebreak. Queries whose terms match nothing
    * simply return no rows. */
  def bm25BatchTopK(docs: DataFrame, idCol: String, textCol: String,
                    queries: DataFrame, k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.schema.length == 2,
      "TextAnalysis.bm25BatchTopK: queries must be a (query_id, term) frame")
    require(k > 0, "TextAnalysis.bm25BatchTopK: k must be positive")
    val q = queries.toDF("query_id", "term").na.drop().distinct()
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    // pre-shuffle postings filter on the union of every query's terms —
    // a broadcast semi-join (the query frame is the small side by
    // contract: thousands of queries, not a corpus)
    val qtok = tok.join(broadcast(q.select("term").distinct()), Seq("term"))
      .select("doc_id", "term")
    bm25TopKPerQuery(bm25ScorePairs(tok, qtok, k1, b), q, k)
  }

  /** Targeted DOCUMENT deletion from a [[bm25IndexBuild]] index — the
    * right-to-be-forgotten completion for the retrieval path (the
    * corpus-side twin is [[Layout.targetedDelete]]): every posting of
    * `docIds` is removed and df / n_docs / tot_dl are decremented by
    * EXACT integer subtraction (the append algebra run backwards), so
    * the refreshed index equals a rebuild without those documents
    * (spec-pinned). One scan + one rewrite of the postings table —
    * inherent, since postings are term-clustered and a document's rows
    * are spread across files. The doomed-side aggregates are
    * O(|deleted docs' postings|). Survivors land in a fresh directory
    * swapped in atomically-enough (write, delete old, rename), so a
    * crash leaves either the old or the new postings, never a mix.
    * For the STREAM-maintained layout
    * ([[graft.streaming.Streams.bm25IndexSink]]) run deletions as this
    * offline pass after stopping the stream — the sink's append-only
    * contract doesn't model retractions. */
  def bm25IndexDelete(spark: org.apache.spark.sql.SparkSession, dir: String,
                      docIds: Seq[Any], maxValues: Int = 1024): Unit = {
    require(docIds.nonEmpty, "TextAnalysis.bm25IndexDelete: no doc ids")
    require(docIds.length <= maxValues,
      s"TextAnalysis.bm25IndexDelete: ${docIds.length} ids exceeds $maxValues — " +
        "a deletion set that large is a rebuild, not an index op")
    val postings = spark.read.parquet(s"$dir/postings")
    val doomed = postings.filter(col("doc_id").isin(docIds: _*))
    // small by contract: materialize the decrements BEFORE any rewrite
    val dfDel = doomed.groupBy("term").agg(count(lit(1)).as("ddf"))
      .localCheckpoint(true)
    val statsDel = doomed.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("dn"), coalesce(sum("dl"), lit(0L)).as("ddl"))
      .localCheckpoint(true)
    // survivors to a fresh directory, then swap — never read and
    // overwrite the same path
    postings
      // NULL ids are not in the deletion set — `!isin` alone would
      // evaluate to NULL on them and silently drop the rows
      .filter(col("doc_id").isNull || !col("doc_id").isin(docIds: _*))
      .write.mode("overwrite").parquet(s"$dir/postings_new")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/postings"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/postings_new"),
      new org.apache.hadoop.fs.Path(s"$dir/postings"))
    spark.catalog.refreshByPath(s"$dir/postings")
    val newDf = spark.read.parquet(s"$dir/df")
      .join(dfDel, Seq("term"), "left")
      .select(col("term"),
        (col("df") - coalesce(col("ddf"), lit(0L))).cast("long").as("df"))
      .filter(col("df") > 0)
      .localCheckpoint(true)
    val newStats = spark.read.parquet(s"$dir/stats").crossJoin(statsDel)
      .select((col("n_docs") - col("dn")).cast("long").as("n_docs"),
        (col("tot_dl") - col("ddl")).cast("long").as("tot_dl"))
      .localCheckpoint(true)
    newDf.write.mode("overwrite").parquet(s"$dir/df")
    newStats.write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Word n-gram shingles (n=3) — the dedup unit for MinHash/Jaccard.
    * Guarded so short docs yield an empty array (Spark `sequence` would
    * otherwise produce a *descending* range for size < 3). */
  def shingles3(text: Column): Column = {
    val t = tokens(text)
    when(size(t) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
  }

  /** Word-trigram shingles as 64-bit hashes — skips building shingle
    * strings entirely. For dedup math (set sizes, Jaccard counts) hashed
    * shingles are equivalent to string shingles up to 64-bit collisions
    * (~n²/2⁶⁵ — negligible), at a fraction of the CPU and shuffle width.
    *
    * Typed implementation, not a Column: sliding-window expressions via
    * `transform(sequence(...), i => element_at(t, i)...)` re-evaluate
    * the token array per element (Spark HOFs are interpreted and don't
    * CSE the bound array), turning shingling O(n²)-ish per doc. A plain
    * JVM loop is linear and ~40× faster at sf0.1 — this is the
    * reference's `transform()` escape hatch (SURVEY §2.2 T6) used as
    * designed. */
  def shingleHashes3Typed(text: String): Array[Long] = {
    val toks = text.split(" ").iterator.filter(_.nonEmpty).toArray
    if (toks.length < 3) Array.empty[Long]
    else {
      val out = new Array[Long](toks.length - 2)
      var i = 0
      while (i < toks.length - 2) {
        // FNV-1a over the space-joined trigram: 64-bit, collision
        // ~n²/2⁶⁵ at corpus scale, and — unlike murmur3 — expressible
        // in plain SQL (HUGEINT arithmetic), which is what lets the
        // full MinHash-LSH pipeline carry a DuckDB oracle
        out(i) = Dedup.strHash64(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
        i += 1
      }
      out.distinct
    }
  }

  /** Bigrams for n-gram frequency analysis. */
  def bigrams(text: Column): Column = {
    val t = tokens(text)
    when(size(t) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
  }

  private def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(m => lit(m)): _*)))

  /** Language-ID by stopword-marker voting (n-gram-free heuristic: count
    * language-specific function words, argmax with fixed precedence
    * en > es > de > fr; no votes → "und"). Deterministic and
    * SQL-expressible, so oracle-checkable; a char-n-gram profile model
    * would follow the same aggregate-over-markers shape. */
  def langIdPredicted(text: Column): Column = {
    val en = markerCount(text, LangMarkers.en)
    val es = markerCount(text, LangMarkers.es)
    val de = markerCount(text, LangMarkers.de)
    val fr = markerCount(text, LangMarkers.fr)
    when(en > 0 && en >= es && en >= de && en >= fr, "en")
      .when(es > 0 && es >= de && es >= fr, "es")
      .when(de > 0 && de >= fr, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Character-n-gram language-ID variant: scores text against small
    * per-language char-trigram profiles (the classic n-gram-profile
    * method in miniature — real profiles would be trained; these are the
    * highest-frequency function-word trigrams per language). Same
    * argmax/precedence contract as [[langIdPredicted]]. */
  def langIdCharNgram(text: Column): Column = {
    def score(trigrams: Seq[String]): Column =
      trigrams.map(t => size(split(text, java.util.regex.Pattern.quote(t))) - 1)
        .reduce(_ + _)
    val en = score(Seq("the", " an", "of "))
    val es = score(Seq(" el", "los", " un"))
    val de = score(Seq("der", "und", "ein"))
    val fr = score(Seq(" le", "les", " et"))
    when(en > 0 && en >= es && en >= de && en >= fr, "en")
      .when(es > 0 && es >= de && es >= fr, "es")
      .when(de > 0 && de >= fr, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  object LangMarkers {
    val en = Seq("the", "and", "of", "to", "a")
    val es = Seq("el", "los", "las", "una")
    val de = Seq("der", "und", "das", "ein")
    val fr = Seq("le", "les", "et", "une")
  }

  val Stopwords = Seq("the", "a", "an", "of", "and", "to", "in", "is")

  def stopwordCount(text: Column): Column = markerCount(text, Stopwords)

  /** Stopword ratio — a standard fluency signal in data-quality filters. */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / nullif(tokenCount(text), lit(0))

  /** Composite quality score in [0,1]: half stopword fluency, half
    * length saturation (docs >= 100 tokens get full length credit). */
  def qualityScore(text: Column): Column =
    coalesce(stopwordRatio(text), lit(0.0)) * 0.5 +
      least(tokenCount(text), lit(100)).cast("double") / 100.0 * 0.5

  /** Rolling polynomial fingerprint over characters, mod 1e9+7.
    * Stays in long range (acc < p, so acc*31 + 127 < 2^35) — safe under
    * ANSI overflow checking; empty-char artifacts of regex split are
    * filtered so engines agree on the char sequence. */
  def fingerprint(text: Column): Column =
    aggregate(
      filter(split(text, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)

  // ---- Gopher quality rules ---------------------------------------------

  /** The Gopher rule-based quality filter (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", table A1): doc-level structural signals that cheaply
    * reject boilerplate/machine-generated text before any model-based
    * scoring. Every signal is a codegen'd builtin expression over one
    * row — narrow, no shuffle, composes with any downstream filter. */
  object Gopher {
    /** The paper's 8 "must contain ≥2 of" function words. */
    val RequiredStopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")

    def meanWordLength(text: Column): Column =
      aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double") /
        nullif(tokenCount(text), lit(0))

    /** '#' and '…'-spelled-"..." occurrences per word. */
    def symbolToWordRatio(text: Column): Column = {
      val hashes = length(text) - length(regexp_replace(text, "#", ""))
      val ellipses = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
      (hashes + ellipses).cast("double") / nullif(tokenCount(text), lit(0))
    }

    def bulletLineFraction(text: Column): Column = {
      val lines = split(text, "\n")
      size(filter(lines, l => trim(l).startsWith("-") || trim(l).startsWith("*") ||
        trim(l).startsWith("•"))).cast("double") / nullif(size(lines), lit(0))
    }

    def ellipsisLineFraction(text: Column): Column = {
      val lines = split(text, "\n")
      size(filter(lines, l => trim(l).endsWith("..."))).cast("double") /
        nullif(size(lines), lit(0))
    }

    /** Fraction of words containing at least one alphabetic character. */
    def alphaWordFraction(text: Column): Column =
      size(filter(tokens(text), t => t.rlike("[a-zA-Z]"))).cast("double") /
        nullif(tokenCount(text), lit(0))

    /** Count of DISTINCT required stopwords present (≥2 passes). */
    def requiredStopwordHits(text: Column): Column =
      size(array_intersect(array_distinct(tokens(text)),
        array(RequiredStopwords.map(lit): _*)))

    /** All rules conjoined with the paper's thresholds. Word-count
      * bounds [minWords, maxWords] are parameters (the paper uses
      * [50, 100000]) so short-doc corpora can tune without forking the
      * other thresholds. */
    def keep(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
      val n = tokenCount(text)
      n.between(minWords, maxWords) &&
        meanWordLength(text).between(3.0, 10.0) &&
        coalesce(symbolToWordRatio(text) < 0.1, lit(false)) &&
        coalesce(bulletLineFraction(text) <= 0.9, lit(false)) &&
        coalesce(ellipsisLineFraction(text) <= 0.3, lit(false)) &&
        coalesce(alphaWordFraction(text) >= 0.8, lit(false)) &&
        requiredStopwordHits(text) >= 2
    }
  }

  // ---- PII redaction ----------------------------------------------------

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  // 13-16 digits allowing space/dash separators (card-shaped), checked
  // before the looser phone pattern so cards don't half-match as phones.
  private val CardRe = "\\b\\d(?:[ -]?\\d){12,15}\\b"
  private val PhoneRe = "(?<![\\w.])\\+?\\d{1,3}[ .-]?\\(?\\d{2,4}\\)?(?:[ .-]?\\d{2,4}){2,3}(?!\\w|\\.\\d)"

  /** Redact common PII shapes (emails, IPv4s, card-shaped digit runs,
    * phone-shaped digit runs) with typed placeholders — the scrub pass a
    * training pipeline runs before publishing text. Pattern order
    * matters: email before phone (digits in local parts), card before
    * phone (a 15-digit run must not half-match as a phone). Pure
    * codegen'd regexp_replace chain — narrow, no shuffle, pushes
    * through any downstream plan. Recall/precision bounds are the
    * regexes'; tune per corpus. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    val c = regexp_replace(i, CardRe, "<CARD>")
    regexp_replace(c, PhoneRe, "<PHONE>")
  }

  /** Count of spans [[redactPii]] replaces — each pattern counted on
    * the text as the previous stage leaves it, mirroring the staged
    * redaction exactly (a card run must not double-count as a phone). */
  def piiCount(text: Column): Column = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    val afterCard = regexp_replace(afterIp, CardRe, "<CARD>")
    size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))) +
      size(regexp_extract_all(afterIp, lit(CardRe), lit(0))) +
      size(regexp_extract_all(afterCard, lit(PhoneRe), lit(0)))
  }

  /** The RE2-expressible subset of [[redactPii]]: email → IPv4 → card,
    * in the same staged order, but WITHOUT the phone pass (its
    * lookaround guards have no RE2 equivalent, so an external engine
    * could not replay it). This is the oracle-checked chain — DuckDB
    * replays these three patterns verbatim; the phone stage on top is
    * spec-covered instead. */
  def redactPiiPortable(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, CardRe, "<CARD>")
  }

  /** Per-stage match counts for [[redactPiiPortable]] (same staged
    * evaluation: each pattern counted on the previous stage's output). */
  def piiCountPortable(text: Column): (Column, Column, Column) = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    (size(regexp_extract_all(text, lit(EmailRe), lit(0))),
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))),
      size(regexp_extract_all(afterIp, lit(CardRe), lit(0))))
  }

  /** The DuckDB-syntax regexes for the portable PII chain, exposed so
    * the oracle SQL is built from the SAME source of truth as the Spark
    * expression (a drift between the two is a correctness bug, not a
    * tuning choice). Java and RE2 agree on these subsets. */
  object PiiPatterns {
    val email: String = EmailRe
    val ipv4: String = Ipv4Re
    val card: String = CardRe
  }

  // ---- URL canonicalization ---------------------------------------------
  //
  // Crawl pipelines dedup and join on URLs, but the same resource
  // arrives as HTTPS://Example.COM/a?utm_source=x&id=3#frag and
  // https://example.com/a?id=3. Canonicalization = lowercase
  // scheme-authority, drop the fragment, and keep ONLY an allowlist of
  // query params (rebuilt in allowlist order) — the allowlist design is
  // what makes the transform pure regexp_extract/concat, portable to
  // the DuckDB oracle verbatim (a general param-preserving rewrite
  // needs backreferences, whose replacement syntax differs between
  // Java ($1) and RE2 (\1)).

  /** Lowercased host (authority) of a URL column; '' when not a URL. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))

  /** Path component ('' when absent); fragment and query excluded. */
  def urlPath(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  /** Value of query parameter `name` ('' when absent). */
  def urlParam(url: Column, name: String): Column =
    regexp_extract(url, s"[?&]${java.util.regex.Pattern.quote(name)}=([^&#]*)", 1)

  /** Canonical form: https://host/path?allowlisted=params — tracking
    * params (utm_* and anything else not allowlisted) and fragments
    * vanish; params come back in allowlist order so equal resources
    * compare equal. Absent params drop out cleanly (concat_ws skips
    * NULLs — same semantics in DuckDB, keeping the oracle verbatim). */
  def canonicalizeUrl(url: Column, keepParams: Seq[String] = Seq("id")): Column = {
    val parts = keepParams.map { p =>
      val v = urlParam(url, p)
      when(v =!= "", concat(lit(s"$p="), v)).otherwise(lit(null))
    }
    val query = concat_ws("&", parts: _*)
    concat(lit("https://"), urlHost(url), urlPath(url),
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }

  /** Unicode normalization of a string column via the codegen'd
    * [[graft.functions.UnicodeNorm]] expression. Run this BEFORE any
    * hash-based dedup/fingerprinting: composed and decomposed forms of
    * the same text must collapse to one representation or every
    * accent-bearing near-duplicate silently escapes the dedup net. */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graftshim.Shim.column(
      graft.functions.UnicodeNorm(
        org.apache.spark.sql.graftshim.Shim.expression(text), form))
}
