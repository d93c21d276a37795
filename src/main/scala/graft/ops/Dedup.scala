package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Document deduplication for LLM-data pipelines (SURVEY §2.6 E1):
  * exact, blocked n-gram Jaccard, MinHash-LSH, SimHash.
  *
  * Scale design (the point of each variant):
  *  - exact: one hash-shuffle on the key; map-side partial agg.
  *  - blocked Jaccard: exact pairwise *within small blocks* — correct
  *    but O(block²); the verification baseline, not the scale path.
  *  - MinHash-LSH: signatures are one explode+groupBy (shuffle by doc),
  *    candidates one self-join on (band, bandHash) (shuffle by band) —
  *    never all-pairs. This is the 100TB path.
  *  - SimHash: 64-bit signature per doc; near-pairs via pigeonhole
  *    blocking on 16-bit chunks (hamming <= 3 guarantees a matching
  *    chunk), then exact popcount filter.
  */
object Dedup {

  /** Exact dedup keeping the smallest id per identical key (deterministic,
    * unlike dropDuplicates' arbitrary-row semantics). */
  def exactByKey(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(keyCol).agg(min(idCol).as(idCol)).select(idCol, keyCol)

  /** |A ∩ B| / |A ∪ B| over two array<string> set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      nullif(size(array_union(a, b)), lit(0))

  // ---- MinHash ----------------------------------------------------------

  /** Mersenne prime 2^31 - 1: the classic universal-hash modulus. */
  private[graft] val P = 2147483647L
  private[graft] val K = 128   // signature length
  private[graft] val Bands = 64 // 64 bands x 2 rows: P(candidate | j=0.5) ~ 1 - 1e-8

  /** Deterministic hash-family coefficients (fixed seed — signatures are
    * reproducible across runs/clusters). */
  private val rnd = new scala.util.Random(42)
  private[graft] val A: Array[Long] = Array.fill(K)(1L + rnd.nextInt((P - 1).toInt))
  private[graft] val B: Array[Long] = Array.fill(K)(rnd.nextInt(P.toInt).toLong)

  /** FNV-1a 64-bit over UTF-16 code units: cheap, deterministic,
    * JVM-side string hash for shingle normalization — and
    * SQL-expressible (the XOR touches only the low 16 bits since
    * every code unit is < 2^16, the wrapping multiply is HUGEINT
    * mod-2⁶⁴ arithmetic), which is what lets the minhash oracle
    * reproduce signatures end-to-end in DuckDB for all BMP text.
    * Oracle-parity caveat: supplementary-plane characters (beyond
    * U+FFFF) hash here as two surrogate units but split as ONE code
    * point in SQL's str_split — astral-character corpora would need a
    * UTF-16 expansion on the oracle side. */
  private[graft] def strHash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** K permutation-mins over a doc's shingle hashes in one tight JVM
    * loop. Duplicate shingles can't change a min, so no de-dup pass.
    *
    * The inner reduction exploits P being the Mersenne prime 2³¹−1:
    * 2³¹ ≡ 1 (mod P), so x mod P folds as (x >>> 31) + (x & P) — two
    * folds take any x < 2⁶³ below P + 4, one conditional subtract
    * finishes. This replaces the 64-bit `%` (a hardware divide, the
    * hot instruction of the whole signature pass: K=128 of them per
    * shingle) with shift/mask/add; bit-identical to `%` for the
    * non-negative x here (guide §1.2 "per-task work", checked
    * exhaustively against `%` in DedupSpec). */
  private[graft] def sigOf(hs: Array[Long]): Array[Long] = {
    val sig = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val hm = ((hs(i) % P) + P) % P // into [0, P); A*hm+B stays < 2^63
      var k = 0
      while (k < K) {
        var v = A(k) * hm + B(k) // < 2^62 + 2^31: non-negative
        v = (v >>> 31) + (v & P) // < 2^33
        v = (v >>> 31) + (v & P) // < P + 4
        if (v >= P) v -= P
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    sig
  }

  /** MinHash signatures: `idCol`, sig array<bigint>[K]. Input: one row
    * per doc with an array-of-shingles column (string or integral
    * elements). Docs with zero shingles are dropped (no signature is
    * defined for the empty set).
    *
    * Computed as a typed narrow map — a per-doc JVM loop, NO shuffle:
    * the signature of a doc depends only on that doc, so an
    * explode+groupBy formulation would shuffle |doc|×|shingles| rows
    * for nothing, and Spark's higher-order array functions are
    * interpreted (no codegen). Embarrassingly parallel at any scale. */
  def minhashSignatures(docs: DataFrame, idCol: String, shingleCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, ShortType, StringType}
    val spark = docs.sparkSession
    import spark.implicits._
    // fail loudly on contract narrowing: a silent cast("long") would null
    // string ids and truncate fractional shingles into false duplicates
    require(Seq(IntegerType, LongType, ShortType).contains(docs.schema(idCol).dataType),
      s"minhash: id column '$idCol' must be integral, got ${docs.schema(idCol).dataType}")
    val elem = docs.schema(shingleCol).dataType.asInstanceOf[ArrayType].elementType
    require(elem == StringType || Seq(IntegerType, LongType, ShortType).contains(elem),
      s"minhash: shingle elements must be string or integral, got $elem")
    val hashed: org.apache.spark.sql.Dataset[(Long, Array[Long])] = elem match {
      case StringType =>
        docs.select(col(idCol).cast("long"), col(shingleCol))
          .as[(Long, Array[String])]
          .map { case (id, sh) => (id, if (sh == null) Array.empty[Long] else sh.map(strHash64)) }
      case _ =>
        docs.select(col(idCol).cast("long"), col(shingleCol).cast("array<long>"))
          .as[(Long, Array[Long])]
          .map { case (id, sh) => (id, if (sh == null) Array.empty[Long] else sh) }
    }
    hashed
      .flatMap { case (id, hs) => if (hs.isEmpty) None else Some((id, sigOf(hs))) }
      .toDF(idCol, "sig")
  }

  /** Candidate pairs from banded LSH over the signatures: (idA, idB),
    * idA < idB. Shuffles on (band, slice) only. The join key is the
    * band's RAW signature slice (r values), not a hash of it: exact
    * band equality is what LSH theory assumes (a band hash can only add
    * false candidates via its own collisions), and plain integers are
    * reproducible in the SQL oracle where xxhash64 is not.
    *
    * `maxBucketSize` is the hot-bucket guard for boilerplate-heavy
    * corpora: a (band, slice) bucket holding B docs emits B² candidate
    * pairs, so one mega-bucket of near-identical boilerplate turns the
    * candidate join quadratic. Buckets above the cap are DROPPED
    * (before pairing — the bucket-size aggregate is one partial-agg
    * pass over the banded rows). Recall cost is negligible for real
    * near-dups: a j≥0.5 pair is expected to collide in ~16 of the 64
    * bands, so it survives unless ALL its buckets are capped — which
    * only happens for content so replicated that exact dedup (run
    * first — see the pipeline-order note on [[minhashNearDups]])
    * already owns it. None (default) = exact behavior, no cap. */
  def lshCandidates(sigs: DataFrame, idCol: String,
                    maxBucketSize: Option[Int] = None): DataFrame = {
    val r = K / Bands
    val slices = (0 until Bands).map { b =>
      array((0 until r).map(j => col("sig")(b * r + j)): _*)
    }
    val all = sigs
      .select(col(idCol), posexplode(array(slices: _*)).as(Seq("band", "slice")))
    val banded = maxBucketSize match {
      case None => all
      case Some(cap) =>
        val sizes = all.groupBy("band", "slice").agg(count(lit(1)).as("bsz"))
        all.join(sizes.filter(col("bsz") <= cap), Seq("band", "slice"))
          .drop("bsz")
    }
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("slice"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("slice"))
    a.join(b, Seq("band", "slice"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Sorted-distinct long-array intersection size: single merge scan,
    * no per-row hash-set builds (what array_intersect does). */
  private def intersectCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    c
  }

  /** Full MinHash-LSH near-dup pipeline: candidates verified by exact
    * Jaccard on the shingle sets, so precision is exact and only recall
    * depends on the LSH parameters. Returns (id_a, id_b, jaccard).
    *
    * Hashed (long) shingles take a typed verification path: sets are
    * distinct+sorted once per doc, then each candidate pair is one
    * merge scan — array_intersect/array_union would rebuild hash sets
    * per pair, the hot loop of the whole pipeline at scale. */
  def minhashNearDups(docs: DataFrame, idCol: String, shingleCol: String,
                      threshold: Double,
                      maxBucketSize: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val elem = docs.schema(shingleCol).dataType.asInstanceOf[ArrayType].elementType
    val cands = lshCandidates(minhashSignatures(docs, idCol, shingleCol), idCol,
      maxBucketSize)
    if (elem == StringType) {
      val sets = docs.select(col(idCol), array_distinct(col(shingleCol)).as("shset"))
      cands
        .join(sets.select(col(idCol).as("id_a"), col("shset").as("set_a")), "id_a")
        .join(sets.select(col(idCol).as("id_b"), col("shset").as("set_b")), "id_b")
        .withColumn("jaccard", jaccard(col("set_a"), col("set_b")))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    } else {
      val spark = docs.sparkSession
      import spark.implicits._
      val sets = docs
        .select(col(idCol).cast("long"), col(shingleCol).cast("array<long>"))
        .as[(Long, Array[Long])]
        .map { case (id, sh) =>
          val d = if (sh == null) Array.empty[Long] else sh.distinct
          java.util.Arrays.sort(d)
          (id, d)
        }
        .toDF(idCol, "shset")
      cands
        .join(sets.select(col(idCol).as("id_a"), col("shset").as("set_a")), "id_a")
        .join(sets.select(col(idCol).as("id_b"), col("shset").as("set_b")), "id_b")
        .select(col("id_a"), col("id_b"), col("set_a"), col("set_b"))
        .as[(Long, Long, Array[Long], Array[Long])]
        .flatMap { case (a, b, sa, sb) =>
          val c = intersectCount(sa, sb)
          val u = sa.length + sb.length - c
          if (u > 0 && c.toDouble / u >= threshold) Some((a, b, c.toDouble / u)) else None
        }
        .toDF("id_a", "id_b", "jaccard")
    }
  }

  // ---- Duplicated-span detection (arbitrary-offset substring dedup) ----

  /** Cross-document duplicated SPANS at arbitrary token offsets — the
    * "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al. 2022) shape, where a 60-token boilerplate paragraph
    * embedded mid-document is found no matter where it starts in
    * either doc (fixed-boundary segment dedup — [[dedupSegments]] —
    * only catches aligned repeats).
    *
    * Method: every `gramLen`-token gram at every offset, inverted-index
    * self-join on the gram, then diagonal run detection — matches of
    * the same doc pair with constant offset difference `d = ia − ib`
    * and consecutive `ia` form one span (gaps-and-islands: `ia −
    * row_number()` is constant within a run). A run of L matching
    * grams witnesses a shared span of L + gramLen − 1 tokens; runs
    * below `minRun` are noise and dropped.
    *
    * Scale shape: the gram explosion is |tokens| rows (the TF-IDF /
    * contamination inverted-index cost, linear); the join shuffles on
    * the gram; the run detection is one window per (pair, diagonal)
    * partition — no all-pairs anything. `maxGramFreq` is the hot-gram
    * guard (same cliff as [[lshCandidates]]'s mega-bucket): a gram in
    * F positions joins F² — cap it and ultra-common boilerplate grams
    * are excluded from seeding runs (true long spans survive via their
    * rarer grams). None = exact, oracle-checked default.
    *
    * Returns (id_a, id_b, start_a, start_b, run_len, span_tokens),
    * id_a < id_b, starts 0-based. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      gramLen: Int = 5, minRun: Int = 10,
                      maxGramFreq: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gramLen >= 1 && minRun >= 1, "duplicatedSpans: gramLen/minRun must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    // Typed gram explosion — one tokenization per doc in a JVM loop.
    // The declarative formulation (transform + element_at over a
    // tokens() array) re-evaluates the interpreted split+filter HOF
    // chain per element_at: measured 7s per join branch at sf0.1 vs
    // ~0.2s for this flatMap — the same interpreted-HOF cliff the
    // round-1 shingling fix documented. Ids must be integral (same
    // contract as minhashSignatures).
    val gramsAll = docs
      .select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = if (text == null) Array.empty[String]
                 else text.split(" ").filter(_.nonEmpty)
        if (ws.length < gramLen) Iterator.empty
        else (0 to ws.length - gramLen).iterator
          .map(i => (id, i, ws.slice(i, i + gramLen).mkString(" ")))
      }
      .toDF("id", "i", "gram")
    val gramsCapped = maxGramFreq match {
      case None => gramsAll
      case Some(cap) =>
        val freq = gramsAll.groupBy("gram").agg(count(lit(1)).as("gf"))
        gramsAll.join(freq.filter(col("gf") <= cap), "gram").drop("gf")
    }
    // Explicit hash repartition on the join key (the jaccardPairs
    // pattern): both self-join sides share ONE exchange (ReusedExchange
    // — the gram explosion runs once, not once per side), the join is
    // co-partitioned (no broadcast build of the full |tokens|-row gram
    // table, which the planner's typed-pipeline size guess otherwise
    // picks and which cannot scale — an inverted index is fact-sized),
    // and the probe parallelizes across partitions instead of running
    // on the unsplittable scan's single task.
    val grams = gramsCapped.repartition(col("gram"))
    val a = grams.select(col("id").as("id_a"), col("i").as("ia"), col("gram"))
    val b = grams.select(col("id").as("id_b"), col("i").as("ib"), col("gram"))
    val matches = a.join(b, Seq("gram")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ia"), col("ib"),
        (col("ia") - col("ib")).as("d"))
    val w = Window.partitionBy("id_a", "id_b", "d").orderBy("ia")
    val islands = matches
      .withColumn("island", col("ia") - row_number().over(w))
      .groupBy("id_a", "id_b", "d", "island")
      .agg(min("ia").as("start_a"), count(lit(1)).as("run_len"))
    // Hot-gram holes: a capped gram INSIDE a true span leaves a hole
    // that splits the diagonal into two islands — each of which can
    // fall under minRun even though the span is long. On the same
    // (pair, diagonal), islands separated by up to gramLen missing
    // grams are overwhelmingly the same span (the hole is the capped
    // boilerplate gram itself), so cap mode bridges them before the
    // minRun filter; run_len counts only MATCHED grams, and
    // span_tokens spans first-to-last matched gram. Exact mode
    // (maxGramFreq = None) has no holes and skips the extra window.
    val merged = maxGramFreq match {
      case None => islands
      case Some(_) =>
        val ord = Window.partitionBy("id_a", "id_b", "d").orderBy("start_a")
        islands
          .withColumn("prev_end",
            lag(col("start_a") + col("run_len"), 1).over(ord))
          .withColumn("new_grp",
            when(col("prev_end").isNull
              || col("start_a") > col("prev_end") + gramLen, 1).otherwise(0))
          .withColumn("grp", sum("new_grp").over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("id_a", "id_b", "d", "grp")
          .agg(min("start_a").as("start_a"), sum("run_len").as("run_len"),
            max(col("start_a") + col("run_len")).as("end_a"))
    }
    val spanTokens = maxGramFreq match {
      case None => col("run_len") + (gramLen - 1)
      case Some(_) => col("end_a") - col("start_a") + (gramLen - 1)
    }
    merged
      .filter(col("run_len") >= minRun)
      .select(col("id_a"), col("id_b"), col("start_a"),
        (col("start_a") - col("d")).as("start_b"),
        col("run_len"), spanTokens.as("span_tokens"))
  }

  /** The removal half of substring dedup (Lee et al. remove the
    * duplicated text, not the document): every span found by
    * [[duplicatedSpans]] is CUT from the higher-id doc of its pair —
    * the lowest-id occurrence in the corpus always survives intact
    * (the higher id of every pair is masked, so the minimum id of a
    * span's clique is never touched; no iteration needed). Overlapping
    * masks within a doc are interval-merged (touching intervals
    * coalesce) before cutting, and the doc is reassembled from the
    * surviving tokens in order — whitespace-normalized, like
    * [[dedupSegments]].
    *
    * Returns every input doc: (idCol, text, n_removed). Scale: the
    * span table is the [[duplicatedSpans]] cost; the merge is a
    * per-doc mapGroups over that doc's spans (tiny); the cut is one
    * narrow map over the docs joined to their merged intervals. */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            gramLen: Int = 5, minRun: Int = 10,
                            maxGramFreq: Option[Int] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val spans = duplicatedSpans(docs, idCol, textCol, gramLen, minRun, maxGramFreq)
    val merged = spans
      .select(col("id_b").as("mid"), col("start_b").cast("long").as("s"),
        (col("start_b") + col("span_tokens")).cast("long").as("e"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val sorted = it.map(t => (t._2, t._3)).toArray.sortBy(identity)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        for ((s, e) <- sorted) {
          if (out.nonEmpty && s <= out.last._2)
            out(out.length - 1) = (out.last._1, math.max(out.last._2, e))
          else out += ((s, e))
        }
        (id, out.toArray.map(_._1), out.toArray.map(_._2))
      }
      .toDF("mid", "starts", "ends")
    docs
      .select(col(idCol).cast("long").as("did"), col(textCol).as("txt"))
      .join(merged, col("did") === col("mid"), "left")
      .select(col("did"), col("txt"), col("starts"), col("ends"))
      .as[(Long, String, Array[Long], Array[Long])]
      .map { case (id, text, starts, ends) =>
        val ws = if (text == null) Array.empty[String]
                 else text.split(" ").filter(_.nonEmpty)
        if (starts == null) (id, ws.mkString(" "), 0L)
        else {
          val kept = ws.iterator.zipWithIndex.filterNot { case (_, i) =>
            var j = 0
            var in = false
            while (j < starts.length && !in) {
              if (i >= starts(j) && i < ends(j)) in = true
              j += 1
            }
            in
          }.map(_._1).toArray
          (id, kept.mkString(" "), (ws.length - kept.length).toLong)
        }
      }
      .toDF(idCol, "text", "n_removed")
  }

  // ---- Incremental LSH: index once, query every batch -------------------

  /** Sorted-distinct copy of a hash array (merge-scan-ready set form). */
  private def sortedSet(hs: Array[Long]): Array[Long] = {
    val d = hs.distinct
    java.util.Arrays.sort(d)
    d
  }

  /** Build a persistable LSH index over a reference corpus: per doc the
    * MinHash signature AND the sorted-distinct shingle-hash set, in ONE
    * narrow typed pass (no shuffle). Write the result as parquet once;
    * every incremental batch then queries it via
    * [[nearDupsAgainstIndex]] without ever re-shingling or re-hashing
    * the corpus — the difference between O(|corpus|) per ingest and
    * O(|batch|) per ingest at 100 TB. Docs with zero shingles are
    * dropped (no signature is defined for the empty set).
    *
    * Input contract matches [[minhashSignatures]]; string shingles are
    * FNV-hashed first so the stored set form is uniformly
    * `array<bigint>` (Jaccard on hashed shingles equals string Jaccard
    * up to 64-bit collisions — the documented trade of
    * [[graft.ops.TextAnalysis.shingleHashes3Typed]]). */
  def buildLshIndex(docs: DataFrame, idCol: String, shingleCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, ShortType, StringType}
    val spark = docs.sparkSession
    import spark.implicits._
    require(Seq(IntegerType, LongType, ShortType).contains(docs.schema(idCol).dataType),
      s"lshIndex: id column '$idCol' must be integral, got ${docs.schema(idCol).dataType}")
    val elem = docs.schema(shingleCol).dataType.asInstanceOf[ArrayType].elementType
    require(elem == StringType || Seq(IntegerType, LongType, ShortType).contains(elem),
      s"lshIndex: shingle elements must be string or integral, got $elem")
    val hashed: org.apache.spark.sql.Dataset[(Long, Array[Long])] = elem match {
      case StringType =>
        docs.select(col(idCol).cast("long"), col(shingleCol))
          .as[(Long, Array[String])]
          .map { case (id, sh) => (id, if (sh == null) Array.empty[Long] else sh.map(strHash64)) }
      case _ =>
        docs.select(col(idCol).cast("long"), col(shingleCol).cast("array<long>"))
          .as[(Long, Array[Long])]
          .map { case (id, sh) => (id, if (sh == null) Array.empty[Long] else sh) }
    }
    hashed
      .flatMap { case (id, hs) =>
        if (hs.isEmpty) None else Some((id, sigOf(hs), sortedSet(hs)))
      }
      .toDF(idCol, "sig", "shset")
  }

  /** Targeted deletion from a PERSISTED flat [[buildLshIndex]] parquet
    * directory — the right-to-be-forgotten leg for the LSH signature
    * artifact, mirroring [[graft.ops.Similarity.ivfPqIndexDelete]]: a
    * forgotten document's MinHash signature and shingle set must stop
    * producing candidate pairs, not just its corpus rows (deleting the
    * corpus row alone leaves the signature matching future batches).
    * Survivors are written to a fresh directory and swapped in — an
    * offline maintenance op, single-writer, like its three siblings.
    * The maintained (batch-dir) index has its own compaction-aware
    * [[graft.streaming.Streams.lshIndexDelete]]. */
  def lshIndexDelete(spark: org.apache.spark.sql.SparkSession,
                     indexDir: String, idCol: String, ids: Seq[Long],
                     maxValues: Int = 1024): Unit = {
    require(ids.nonEmpty, "Dedup.lshIndexDelete: no ids")
    require(ids.length <= maxValues,
      s"Dedup.lshIndexDelete: ${ids.length} ids exceeds $maxValues — " +
        "a deletion set that large is a rebuild, not an index op")
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // self-heal a previous crashed swap: the index renamed aside with
    // no replacement in place is restored before anything else
    val aside = new org.apache.hadoop.fs.Path(s"$indexDir.__old")
    if (fs.exists(aside) && !fs.exists(new org.apache.hadoop.fs.Path(indexDir)))
      fs.rename(aside, new org.apache.hadoop.fs.Path(indexDir))
    fs.delete(aside, true)
    spark.read.parquet(indexDir)
      // NULL ids are not in the deletion set — `!isin` alone would
      // evaluate to NULL on them and silently drop the rows
      .filter(col(idCol).isNull || !col(idCol).isin(ids: _*))
      .write.mode("overwrite").parquet(s"$indexDir.__new")
    // two-rename swap (old aside, new in, old dropped): a crash at any
    // point leaves either the original or the aside copy restorable —
    // delete-then-rename could lose the whole index to a crash between
    // the two steps
    fs.rename(new org.apache.hadoop.fs.Path(indexDir), aside)
    fs.rename(new org.apache.hadoop.fs.Path(s"$indexDir.__new"),
      new org.apache.hadoop.fs.Path(indexDir))
    fs.delete(aside, true)
    spark.catalog.refreshByPath(indexDir)
  }

  /** Signature table → one row per (id, band, slice) for the banded
    * equi-join. Kept as raw slices (not slice hashes) for the same
    * oracle-reproducibility reason as [[lshCandidates]]. */
  private def bandedSlices(index: DataFrame, idCol: String, outId: String): DataFrame = {
    val r = K / Bands
    val slices = (0 until Bands).map { b =>
      array((0 until r).map(j => col("sig")(b * r + j)): _*)
    }
    index.select(col(idCol).as(outId), posexplode(array(slices: _*)).as(Seq("band", "slice")))
  }

  /** Near-duplicates of an incremental `batch` against a prebuilt
    * corpus [[buildLshIndex]] — the steady-state ingest shape: "which
    * docs in today's crawl slice near-duplicate the training corpus".
    * Returns (corpus_id, batch_id, jaccard >= threshold), candidates
    * verified by exact Jaccard merge scans (precision exact, recall =
    * the LSH bands').
    *
    * Scale shape when `broadcastBatch` (default): the batch's banded
    * slices and shingle sets BROADCAST; the corpus index is scanned
    * in place and NEVER shuffles — per-ingest cost is one corpus scan
    * + |candidates|, regardless of corpus size. Set
    * `broadcastBatch=false` when the batch is itself huge (backfill):
    * both sides then shuffle on (band, slice), the [[lshCandidates]]
    * plan. */
  def nearDupsAgainstIndex(index: DataFrame, batch: DataFrame, idCol: String,
                           shingleCol: String, threshold: Double,
                           broadcastBatch: Boolean = true): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val bIdx = buildLshIndex(batch, idCol, shingleCol)
    val maybeBc: DataFrame => DataFrame =
      if (broadcastBatch) df => broadcast(df) else identity
    val cands = bandedSlices(index, idCol, "corpus_id")
      .join(maybeBc(bandedSlices(bIdx, idCol, "batch_id")), Seq("band", "slice"))
      .select("corpus_id", "batch_id")
      .distinct()
    cands
      .join(index.select(col(idCol).as("corpus_id"), col("shset").as("set_a")), "corpus_id")
      .join(maybeBc(bIdx.select(col(idCol).as("batch_id"), col("shset").as("set_b"))),
        "batch_id")
      .select(col("corpus_id"), col("batch_id"), col("set_a"), col("set_b"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .flatMap { case (a, b, sa, sb) =>
        // Self-pair exclusion: a doc present in BOTH the index and the
        // batch would return itself as a jaccard-1.0 "near-dup". But raw
        // id equality alone is NOT identity when id spaces overlap across
        // re-ingests (the scenario this path serves), so a pair is dropped
        // only when the id match is corroborated by identical shingle
        // sets — a colliding id over DIFFERENT content stays a genuine
        // candidate instead of a silent false negative. Arrays.equals is
        // order-insensitive SET equality here because both sides come
        // from buildLshIndex, whose `shset` is canonical (sortedSet:
        // sorted + distinct); such surviving (a,a) rows with jaccard<1
        // are the id-collision signal for downstream consumers.
        if (a == b && java.util.Arrays.equals(sa, sb)) None
        else {
          val c = intersectCount(sa, sb)
          val u = sa.length + sb.length - c
          if (u > 0 && c.toDouble / u >= threshold) Some((a, b, c.toDouble / u)) else None
        }
      }
      .toDF("corpus_id", "batch_id", "jaccard")
  }

  // ---- Dedup against a reference corpus ---------------------------------

  /** Dedup-against-corpus with a broadcast Bloom pre-filter — the
    * documented 100TB path for "drop the new crawl's docs already in
    * the training set". A Bloom filter over the reference fingerprints
    * is built in one aggregation (the driver holds only the sketch,
    * `-n·ln(fpp)/ln²2` bits ≈ 1.2 GB per 10⁹ keys at 1% fpp) and
    * broadcast; rows it rules out are DEFINITELY new and bypass the
    * join entirely, and only the ~fpp-fraction of flagged rows reach
    * the exact anti-join. Bloom filters have no false negatives, so the
    * result is row-identical to the plain anti-join — same oracle —
    * while the shuffle carries |new|·(dupRate + fpp) rows instead of
    * |new|. The membership probe is a per-row UDF by necessity (Spark
    * exposes no Column API over sketches); it is narrow, branch-free,
    * and prunes a shuffle — the one trade the "functions, not UDFs"
    * rule exists to permit. */
  def dedupAgainstBloom(newDocs: DataFrame, refFps: DataFrame, fpCol: String,
                        expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val spark = newDocs.sparkSession
    val bloom = refFps.stat.bloomFilter(fpCol, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val might = udf((s: String) => s != null && bc.value.mightContainString(s))
    val definitelyNew = newDocs.filter(!might(col(fpCol)))
    val flagged = newDocs.filter(might(col(fpCol)))
    val verified = flagged.join(refFps.select(fpCol).distinct(), Seq(fpCol), "left_anti")
    definitelyNew.unionByName(verified.select(newDocs.columns.toIndexedSeq.map(col): _*))
  }

  // ---- Segment-level (sub-document) dedup --------------------------------

  /** Split a doc into consecutive `segWords`-word segments (last one may
    * be short). Typed narrow flatMap — per-doc JVM loop, no shuffle (a
    * `transform(sequence(...))` HOF would be interpreted per element). */
  def segmentize(docs: DataFrame, idCol: String, textCol: String, segWords: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val words = if (text == null) Array.empty[String] else text.split(' ')
        val n = (words.length + segWords - 1) / segWords
        (0 until n).iterator.map { i =>
          (id, i, words.slice(i * segWords, math.min((i + 1) * segWords, words.length))
            .mkString(" "))
        }
      }
      .toDF(idCol, "seg_idx", "seg")
  }

  /** Segment-level exact dedup across the corpus — the distributed
    * granularity of "deduplicating training data" below whole-document
    * level (Lee et al. 2022 dedup exact substrings with a suffix array;
    * pipelines at cluster scale approximate that at fixed segment
    * granularity, which is what C4-style line dedup is). Every
    * `segWords`-word segment survives only at its FIRST corpus
    * occurrence (min (doc_id, seg_idx) — deterministic, not
    * dropDuplicates' arbitrary row); docs are reassembled from their
    * surviving segments in order. Docs whose every segment occurs
    * earlier elsewhere vanish entirely (the whole-doc-dup case).
    *
    * Scale shape: segmentize is narrow; ONE hash shuffle on the segment
    * text with a map-side-combinable min — the winner row IS the
    * surviving segment, so no join back; reassembly is a second keyed
    * shuffle on doc id. Both keys are high-cardinality and skew-free
    * (segment texts; doc ids). At 100 TB the segment-text shuffle key
    * can be swapped for fnv64(seg) to shrink shuffle bytes — kept as
    * raw text here so the oracle compares exact strings, not hashes.
    *
    * Output: (idCol, text — surviving segments joined, n_kept). */
  def dedupSegments(docs: DataFrame, idCol: String, textCol: String,
                    segWords: Int): DataFrame = {
    val segs = segmentize(docs, idCol, textCol, segWords)
    val winners = segs
      .groupBy("seg")
      .agg(min(struct(col(idCol), col("seg_idx"))).as("w"))
      .select(col(s"w.$idCol").as(idCol), col("w.seg_idx").as("seg_idx"), col("seg"))
    winners
      .groupBy(idCol)
      .agg(
        array_join(expr("transform(array_sort(collect_list(struct(seg_idx, seg))), x -> x.seg)"),
          " ").as(textCol),
        count(lit(1)).cast("long").as("n_kept"))
  }

  // ---- Embedding near-dup (sign-LSH blocked) ----------------------------

  /** Embedding-cosine near-dup pairs: deterministic integer sign-LSH
    * blocking + exact cosine verification — the 100TB shape. Candidates
    * are rows sharing a (table, bucket) cell in ANY of `tables` tables
    * (a hash equi-join), verified with the exact codegen'd cosine;
    * there is no all-pairs/NestedLoop anywhere in the plan.
    *
    * Precision is exact (every emitted pair really has cos >= threshold);
    * recall is probabilistic like MinHash-LSH: 1.0 on clustered corpora
    * at real near-dup thresholds (cos >= 0.9 — see the clustered-recall
    * spec), ~0.8 worst-case on fully isotropic vectors at cos 0.4 (the
    * synthetic test data — measured in DedupSpec). The quantized
    * projections are exact int64 arithmetic, so a plain-SQL oracle
    * reproduces the blocking bit-for-bit — unlike gaussian planes, this
    * keeps the operator hash-checkable end-to-end.
    *
    * The exact all-pairs formulation ([[embedNearDupsExact]]) remains
    * the recall baseline in specs, NOT a shipped operator: an exact
    * sub-quadratic cosine-threshold join over dense vectors does not
    * exist in general, so at corpus scale blocked-candidates-plus-verify
    * is the honest contract (same as every production near-dup system).
    *
    * Pipeline order matters: run [[exactByKey]] (or a groupBy on the
    * vector) FIRST — exact-duplicate clusters land in the same buckets
    * in every table and multiply each collision by cluster² candidate
    * pairs (measured 25M pairs / ~600s from 25× replicas at ScaleProbe
    * volume vs seconds after dedup). Size `planesPerTable` ≈ log2(n):
    * bucket count must track the corpus.
    */
  def embedNearDups(emb: DataFrame, threshold: Double, tables: Int = 48,
                    planesPerTable: Int = 8, dim: Int = 64): DataFrame = {
    // repartition on the join key so both self-join sides share one
    // exchange (ReusedExchange): signatures are computed ONCE
    val sigs = Similarity.intBucketSignatures(emb, "vid", tables, planesPerTable, dim)
      .repartition(col("tbl"), col("bucket"))
    val cand = sigs.select(col("vid").as("id_a"), col("tbl"), col("bucket"))
      .join(sigs.select(col("vid").as("id_b"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val vb = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Exact all-pairs baseline for [[embedNearDups]] recall specs — O(n²)
    * by construction; never ship this against a real corpus. */
  def embedNearDupsExact(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  // ---- Duplicate clusters (connected components) ------------------------

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14):
    * large-star hangs every neighbor larger than `u` under
    * min(Γ(u) ∪ u); small-star hangs `u` and its smaller neighbors
    * under its minimum neighbor. Each round halves tree heights, so
    * convergence is O(log n) rounds even on chain graphs where
    * min-label propagation needs O(diameter). Per round: two
    * groupBy+join shuffles on node id, edges localCheckpoint'ed, the
    * driver carries only the convergence probe. Returns
    * ((node, comp) labels, rounds used). */
  private[graft] def connectedComponentsStarWithRounds(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50, reliable: Boolean = false): (DataFrame, Int) = {
    def ckpt(df: DataFrame): DataFrame = Checkpoints.materialize(df, reliable)
    var cur = ckpt(edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct())
    var rounds = 0
    var converged = cur.limit(1).count() == 0
    while (!converged && rounds < maxIter) {
      // large-star: (v, m) for v ∈ Γ(u), v > u, m = min(Γ(u) ∪ {u});
      // output is oriented large→small by construction (v > u >= m)
      val sym = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val mLarge = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = sym.join(mLarge, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star on the oriented edges: hang u and all its smaller
      // neighbors under u's minimum neighbor
      val mSmall = ls.groupBy("u").agg(min("v").as("m"))
      val withM = ls.join(mSmall, "u")
      val ss = ckpt(withM.select(col("v").as("u"), col("m").as("v"))
        .union(withM.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct())
      converged = ss.count() == cur.count() &&
        ss.exceptAll(cur).limit(1).count() == 0
      // the superseded round's edge blocks are dead now (ss is eagerly
      // materialized and the convergence probe above was the last read)
      // — release them instead of pinning O(rounds) block sets
      Checkpoints.release(cur, reliable)
      cur = ss
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxIter rounds")
    // fixed point is a star per component: every edge points at the
    // component minimum
    val labels = cur.select(col("u").as("node"), col("v").as("comp"))
      .union(cur.select(col("v").as("node"), col("v").as("comp")))
      .groupBy("node").agg(min("comp").as("comp"))
    (labels, rounds)
  }

  /** [[connectedComponentsStarWithRounds]] without the round count. */
  def connectedComponentsStar(edges: DataFrame, srcCol: String, dstCol: String,
                              maxIter: Int = 50,
                              reliable: Boolean = false): DataFrame =
    connectedComponentsStarWithRounds(edges, srcCol, dstCol, maxIter,
      reliable)._1

  /** Connected components over an undirected edge list: (node, comp)
    * where comp is the minimum node id reachable from `node`. Only
    * nodes appearing in an edge are returned (isolated nodes are their
    * own component — callers left-join and coalesce).
    *
    * Min-label propagation on co-partitioned RDDs (the
    * [[graft.ops.Graph.pageRank]] recurrence shape, optimization guide
    * §2.4 "remove shuffles outright"): the symmetric edge list is
    * shuffled ONCE (keyed by the neighbor side) and persisted; each
    * round reads comp(neighbor) through a narrow `zipPartitions` +
    * primitive `LongMap` lookup, pays exactly one |V|-scale
    * map-side-combined `reduceByKey` shuffle for the per-node min, and
    * folds the convergence probe into the SAME job via an accumulator
    * counting changed labels — one job per round, versus the previous
    * eager per-round DataFrame loop's three (propagate, materialize,
    * probe), each re-paying Catalyst analysis. Per-round arithmetic is
    * unchanged (comp' = min(comp, min over neighbors' comp); rounds
    * bounded by component diameter; near-dup clusters converge in 2-3
    * rounds), so labels and round counts match the old loop exactly.
    * An accumulator can only over-count under task retry, never
    * under-count, so a retry can at worst add one extra round — it can
    * never produce a false early convergence.
    *
    * If propagation has not converged after `switchAfter` rounds, the
    * component diameter exceeds the budget (a long-chain graph) and the
    * implementation switches to [[connectedComponentsStar]] — O(log n)
    * rounds at the same per-round shuffle cost — instead of crawling
    * one hop per round, seeded from the already-materialized edge RDD.
    * `reliable = true` durably checkpoints each round's label vector
    * (set `spark.sparkContext.setCheckpointDir` first) so executor
    * loss costs a re-read instead of the job; identical labels either
    * way (spec-pinned). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50, switchAfter: Int = 8,
                          reliable: Boolean = false): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    val sc = spark.sparkContext
    // symmetrize in SQL (UnsafeRow union), then key each directed copy
    // by its NEIGHBOR (b) so a round's comp(b) lookup is local
    val fwd = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    val symDf = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
    val symRdd = symDf.rdd.map(r => (r.getLong(1), r.getLong(0))) // (b, a)
    // partitioner width follows the plan's own output partitioning —
    // data-proportional, not a constant tuned to one host
    val parts = math.max(symRdd.getNumPartitions, 1)
    val part = new HashPartitioner(parts)
    val es = symRdd.partitionBy(part) // the ONE edge-list shuffle
      .persist(StorageLevel.MEMORY_AND_DISK)
    // labels(v) = min(v, min neighbor) — same init as the DF loop had
    var labels = es
      .mapPartitions(_.map { case (b, a) => (a, math.min(a, b)) },
        preservesPartitioning = false)
      .reduceByKey(part, math.min(_: Long, _: Long))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var converged = false
    while (iter < math.min(switchAfter, maxIter) && !converged) {
      val changed = sc.longAccumulator(s"cc-changed-$iter")
      // narrow hash join: es and labels share `part`; every node in an
      // edge carries a label (labels were derived from es), so the
      // LongMap lookup is total
      val proposals = es.zipPartitions(labels,
        preservesPartitioning = false) { (eIt, lIt) =>
        val m = new scala.collection.mutable.LongMap[Long]()
        lIt.foreach { case (k, v) => m(k) = v }
        eIt.map { case (b, a) => (a, m(b)) }
      }
      val minNb = proposals.reduceByKey(part, math.min(_: Long, _: Long)) // map-side combined
      val next = labels.zipPartitions(minNb,
        preservesPartitioning = true) { (lIt, nIt) =>
        val m = new scala.collection.mutable.LongMap[Long]()
        nIt.foreach { case (k, v) => m(k) = v }
        lIt.map { case (n, c) =>
          val nc = math.min(c, m.getOrElse(n, c))
          if (nc != c) changed.add(1L)
          (n, nc)
        }
      }
      if (reliable) next.checkpoint()
      next.persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // the round's ONE job: shuffle + merge + probe
      converged = changed.value == 0
      labels.unpersist(blocking = false)
      labels = next
      iter += 1
    }
    val schema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("comp", LongType, nullable = false)))
    if (!converged) {
      // component diameter exceeds the propagation budget: a long-chain
      // graph where one-hop-per-round would crawl. Star contraction
      // finishes in O(log n) rounds on exactly these graphs. Seed it
      // with the already-materialized edge RDD — re-deriving from
      // `edges` would re-execute the whole upstream pipeline (LSH
      // candidate join etc.) the persist cut off.
      val symBack = spark.createDataFrame(
        es.map { case (b, a) => Row(a, b) },
        StructType(Seq(StructField("a", LongType, nullable = false),
          StructField("b", LongType, nullable = false))))
      // star's driver loop eagerly materializes its first round from
      // symBack, so releasing es afterwards cannot force a recompute
      val out = connectedComponentsStar(symBack, "a", "b", maxIter, reliable)
      // star ran to completion: its result reads only its own
      // checkpointed fixed point, so the seed edges and the abandoned
      // propagation labels are both dead
      es.unpersist(blocking = false)
      labels.unpersist(blocking = false)
      out
    } else {
      // the returned labels are persisted and materialized
      // (self-contained); the edge blocks served their last round
      es.unpersist(blocking = false)
      spark.createDataFrame(labels.map { case (n, c) => Row(n, c) }, schema)
    }
  }

  // ---- Winnowing --------------------------------------------------------

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken): rolling hashes
    * of char k-grams, keeping the minimum in each sliding window of `w`
    * (rightmost on ties), deduplicating consecutive picks. Guarantees
    * any shared substring of length >= k + w - 1 shares a fingerprint —
    * the substring-robust fingerprint (vs whole-doc hashing, which any
    * edit breaks). Typed (sliding-window work; see shingleHashes3Typed
    * for why not a Column HOF). */
  def winnowFingerprints(text: String, k: Int = 5, w: Int = 4): Array[Long] = {
    if (text.length < k) return Array.empty[Long]
    val n = text.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 1125899906842597L
      var j = 0
      while (j < k) { h = h * 31 + text.charAt(i + j); j += 1 }
      hs(i) = h
      i += 1
    }
    if (n <= w) Array(hs.min)
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var lastPick = -1
      var s = 0
      while (s + w <= n) {
        var best = s
        var j = s
        while (j < s + w) { if (hs(j) <= hs(best)) best = j; j += 1 }
        if (best != lastPick) { out += hs(best); lastPick = best }
        s += 1
      }
      out.toArray
    }
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash per doc from a token-array column: sign of the
    * per-bit vote sum over the FNV-1a token hash (SQL-reproducible, so
    * the operator carries a DuckDB oracle; every occurrence votes, so
    * token frequency weights the signature). One narrow typed explode +
    * one groupBy; the 64 vote sums fold map-side. */
  def simhash64(docs: DataFrame, idCol: String, tokenCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ex = docs
      .select(col(idCol).cast("long"), col(tokenCol).cast("array<string>"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, toks) =>
        if (toks == null) Iterator.empty else toks.iterator.map(t => (id, strHash64(t)))
      }
      .toDF(idCol, "h")
    val votes = (0 until 64).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1)).as(s"v$j")
    }
    val bits = (0 until 64)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    ex.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), bits.as("simhash"))
  }

  /** Near-pairs by SimHash: hamming(a,b) <= maxDist (<= 3 by default).
    * Pigeonhole blocking on the 4 16-bit chunks — a pair within distance
    * 3 must agree on at least one chunk, so the join never goes
    * all-pairs; the exact popcount filter runs only on blocked pairs. */
  def simhashNearPairs(sigs: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("chunk"), shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ck"))
    }
    val blocked = sigs.select(col(idCol), col("simhash"),
      explode(array(chunks: _*)).as("b")).select(col(idCol), col("simhash"),
      col("b.chunk").as("chunk"), col("b.ck").as("ck"))
    val a = blocked.select(col(idCol).as("id_a"), col("simhash").as("sh_a"), col("chunk"), col("ck"))
    val b = blocked.select(col(idCol).as("id_b"), col("simhash").as("sh_b"), col("chunk"), col("ck"))
    a.join(b, Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
