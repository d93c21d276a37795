package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning.
  *
  * Parquet readers skip row groups whose column min/max stats exclude
  * the predicate. That only works if the physical layout makes the
  * per-file/per-row-group stat ranges NARROW for the filtered columns.
  * Sorting clusters one column; a Z-order (Morton) curve clusters
  * several at once: range-partitioning by the interleaved-bit z-value
  * gives every output file a contiguous z-range, which is a small box
  * in (a, b) space — so point/range predicates on EITHER column skip
  * most files' row groups. The standard layout move for a 100TB table
  * queried along more than one dimension.
  *
  * Codegen-friendly: the z-value is a pure bit-op Column expression
  * (shifts/and/or — whole-stage codegen), no UDF.
  */
object Layout {

  /** Morton z-value interleaving the low `bits` bits of two
    * non-negative integral columns (a → even bit positions, b → odd).
    * Values are clamped into [0, 2^bits) by masking — callers should
    * pre-bucket wide domains (e.g. `col / width`) so the low bits
    * carry the locality. */
  def zvalue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val am = a.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val bm = b.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce((x, y) => x.bitwiseOR(y))
  }

  /** N-dimensional Morton interleave — [[zvalue2]] generalized to the
    * (lat, lon, time)-style layouts that need 3+ clustering dimensions:
    * bit i of column d lands at position i·N + d. Same masking contract
    * (values into [0, 2^bits); pre-bucket wide domains) and the same
    * pure shift/mask arithmetic, so an oracle replays it with unrolled
    * SQL. N·bits must fit a signed long (≤ 63). */
  def zvalueN(cols: Seq[Column], bits: Int = 8): Column = {
    require(cols.size >= 2, "zvalueN: need >= 2 columns")
    require(bits >= 1 && cols.size * bits <= 63,
      s"zvalueN: ${cols.size} cols x $bits bits exceeds a signed long")
    val n = cols.size
    val masked = cols.map(_.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    (for { i <- 0 until bits; d <- masked.indices } yield
      shiftleft(shiftright(masked(d), i).bitwiseAND(lit(1L)), i * n + d))
      .reduce((x, y) => x.bitwiseOR(y))
  }

  /** The SQL mirror of [[zvalueN]] for oracle replay: emits the same
    * unrolled shift/mask expression over column names. */
  def zvalueNSql(colNames: Seq[String], bits: Int): String = {
    val n = colNames.size
    (for { i <- 0 until bits; d <- colNames.indices } yield
      s"((((${colNames(d)} >> $i) & 1)) << ${i * n + d})")
      .mkString(" | ")
  }

  /** Hilbert-curve index of (a, b) over a 2^bits × 2^bits grid — the
    * stronger locality alternative to [[zvalue2]]: consecutive Hilbert
    * indices are ALWAYS grid-adjacent (Manhattan distance 1), where the
    * Morton curve jumps across the space at power-of-two boundaries, so
    * range-partitioning by Hilbert index gives each output file a
    * tighter (a, b) box and therefore better row-group pruning for box
    * predicates. Implemented as the native codegen'd
    * [[graft.functions.Hilbert2]] expression (the walk is a loop with
    * coordinate swaps — `Column` case-when composition would duplicate
    * sub-expressions 4^bits-fold; see the expression's scaladoc).
    * LayoutSpec pins the adjacency invariant (every consecutive index
    * pair is one grid step) — the property Morton provably lacks.
    *
    * Values are masked into [0, 2^bits) like [[zvalue2]]; pre-bucket
    * wide domains so the low bits carry the locality. */
  def hilbert2(a: Column, b: Column, bits: Int = 8): Column =
    org.apache.spark.sql.graftshim.Shim.column(
      graft.functions.Hilbert2(
        org.apache.spark.sql.graftshim.Shim.expression(a.cast("long")),
        org.apache.spark.sql.graftshim.Shim.expression(b.cast("long")), bits))

  /** The same xy→d walk emitted as SQL (one chained CTE per level) so an
    * external engine can replay [[hilbert2]] bit-for-bit — the oracle
    * and the Column expression are generated from ONE algorithm
    * description, eliminating drift between engine and checker.
    * `src` must provide columns `a`, `b` (pre-masked domain) plus
    * `keyCols`; returns a query yielding keyCols + a, b, hkey. */
    def hilbert2Sql(src: String, keyCols: Seq[String], bits: Int): String = {
    val mask = (1L << bits) - 1
    val keys = keyCols.mkString(", ")
    val levels = (0 until bits).map(i => 1L << (bits - 1 - i))
    val ctes = new StringBuilder(
      s"WITH lvl0 AS (SELECT $keys, a & $mask AS x, b & $mask AS y, CAST(0 AS BIGINT) AS d FROM $src)")
    levels.zipWithIndex.foreach { case (s, i) =>
      val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
      // flips only happen in the ry=0 quadrants (then x/y swap); ry=1
      // leaves both coordinates untouched — same walk as the Column
      // version's fx/fy/nx/ny
      ctes.append(
        s""",
           |lvl${i + 1} AS (SELECT $keys,
           |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${s - 1} - y ELSE y END)
           |       ELSE x END AS x,
           |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${s - 1} - x ELSE x END)
           |       ELSE y END AS y,
           |  d + ${s * s} * xor(3 * $rx, $ry) AS d
           |  FROM lvl$i)""".stripMargin)
    }
    ctes.append(s"\nSELECT $keys, CAST(d AS BIGINT) AS hkey FROM lvl$bits")
    ctes.toString
  }

  /** Write `df` z-ordered on (a, b) into `nFiles` range-partitioned
    * parquet files. repartitionByRange samples z-value boundaries (no
    * full sort shuffle beyond the one range exchange); within each
    * partition rows are additionally sorted by z so row groups inside a
    * file are clustered too. */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
                    nFiles: Int, bits: Int = 16): Unit = {
    val z = zvalue2(a, b, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a small-file parquet directory into `targetBytes`-sized
    * files — the table-maintenance pass that keeps a 100TB corpus
    * readable after streaming/incremental ingestion has littered it
    * with per-trigger files. Scan-side split planning already groups
    * small files into tasks (`maxPartitionBytes`/`openCostInBytes`);
    * what it cannot fix is NameNode/listing pressure, per-file footer
    * overhead, and row groups far below the HDFS block, which is what
    * rewriting does. File count = ceil(inputBytes / targetBytes)
    * from the source's actual on-disk size — no collect, no sampling;
    * a round-robin repartition balances rows regardless of input skew.
    * Content-preserving by construction (a pure rewrite), which
    * LayoutSpec asserts along with the output file count. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetBytes: Long = 128L << 20): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val inputBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1L, (inputBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles.toLong
  }

  /** Build a file-level min/max stats index over a parquet directory:
    * one row per (file, indexed column) with its min and max — the
    * manifest a lakehouse table format keeps, as a plain DataFrame you
    * can persist next to the data. One scan builds it; after that,
    * [[readPruned]] answers box predicates by consulting the (tiny)
    * index instead of opening every file's footer. On a 100 TB table
    * the footer-listing pass itself is the bottleneck this removes —
    * and it is what makes the [[writeZOrdered]]/[[hilbert2]] layouts
    * pay off twice: clustered files have NARROW min/max spans, so the
    * index prunes most of them for any box query. */
  def statsIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                 cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Layout.statsIndex: no columns")
    indexOf(spark.read.parquet(path), cols, Nil, 0, 0)
  }

  /** Fibonacci-hash position of a value's canonical string rendering —
    * the fingerprint's bit index. High-bits extraction (`(h·φ) >>> (64−
    * lg)`, the [[graft.functions.KmvSketch]] house arithmetic) because
    * a power-of-two modulus of a product would depend only on the LOW
    * operand bits. Identical on both sides: the build uses the
    * codegen'd [[graft.functions.Fnv64]], the probe recomputes with
    * its Scala twin [[graft.ops.Dedup.strHash64]]. */
  private val FpFib = 0x9E3779B97F4A7C15L
  private def fpSalt(j: Int): Long = FpFib * (2L * j + 1L)
  private def fpLg(bits: Int): Int = {
    require(bits >= 64 && Integer.bitCount(bits) == 1,
      s"fingerprint bits must be a power of two >= 64, got $bits")
    63 - java.lang.Long.numberOfLeadingZeros(bits.toLong)
  }
  private[graft] def fpPos(v: String, j: Int, bits: Int): Int = {
    val h = graft.ops.Dedup.strHash64(v)
    (((h ^ fpSalt(j)) * FpFib) >>> (64 - fpLg(bits))).toInt
  }
  /** One-bit membership probe against a stored bitmap fingerprint. */
  private def bitTest(fp: Column, pos: Int): Column = {
    val shim = org.apache.spark.sql.graftshim.Shim
    shim.column(graft.functions.BitmapContains(
      shim.expression(fp), shim.expression(lit(pos))))
  }

  private def fpPosCol(c: Column, j: Int, bits: Int): Column = {
    // native expressions end to end: the multiply must WRAP (ANSI-mode
    // SQL `*` throws on Long overflow), and the build stays codegen'd
    val shim = org.apache.spark.sql.graftshim.Shim
    shim.column(graft.functions.FibonacciPos(
      graft.functions.Fnv64(shim.expression(c.cast("string"))),
      fpSalt(j), 64 - fpLg(bits)))
  }

  /** One pass over `df`: per-file row count, min/max per stats column,
    * and (when `fpCols` is set) per-file membership fingerprints — a
    * FIXED `fpBits/8`-byte Bloom bitmap ([[graft.functions
    * .BloomBitmapAgg]]; bits at `fpHashes` Fibonacci-hash positions
    * per value). Bitmap, not a position set: at high per-file
    * cardinality a sparse set is as large as the column itself and
    * membership is a linear scan, while the bitmap is flat-sized
    * (parquet RLE squeezes the zeros when sparse) with one-bit-test
    * probes, and OR-merge makes the bytes identical under any row
    * order. `fp_bits`/`fp_k` ride along as constant columns so the
    * probe can never disagree with the build. */
  private def indexOf(df: DataFrame, cols: Seq[String], fpCols: Seq[String],
                      fpBits: Int, fpHashes: Int): DataFrame = {
    val base = df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c"))): _*)
    if (fpCols.isEmpty) base
    else {
      val shim = org.apache.spark.sql.graftshim.Shim
      val withFp = fpCols.foldLeft(base) { (acc, c) =>
        val fp = df
          .select(input_file_name().as("file"), col(c).cast("string").as("v"))
          .where(col("v").isNotNull)
          .select(col("file"), explode(array((0 until fpHashes).map(j =>
            fpPosCol(col("v"), j, fpBits)): _*)).as("pos"))
          .groupBy("file")
          .agg(shim.column(graft.functions.BloomBitmapAgg(
            shim.expression(col("pos")), fpBits / 8)
            .toAggregateExpression()).as(s"fp_$c"))
        acc.join(fp, Seq("file"), "left")
      }
      withFp.withColumn("fp_bits", lit(fpBits)).withColumn("fp_k", lit(fpHashes))
    }
  }

  /** Index rows for an EXPLICIT file list — what the streaming sink
    * ([[graft.streaming.Streams.skippingIndexSink]]) uses: the file
    * source's checkpoint log names each batch's files, so the refresh
    * never diffs the directory at all. */
  private[graft] def indexForFiles(spark: org.apache.spark.sql.SparkSession,
                                   files: Seq[String], cols: Seq[String],
                                   fpCols: Seq[String], fpBits: Int,
                                   fpHashes: Int): DataFrame =
    indexOf(spark.read.parquet(files: _*), cols, fpCols, fpBits, fpHashes)

  /** [[statsIndex]] plus per-file MEMBERSHIP fingerprints for
    * `fpCols` — the file-skipping min/max can't give. On an
    * unclustered high-cardinality column every file spans the whole
    * value range, so box pruning keeps everything; a point lookup
    * (`WHERE user_id = …`, the commonest 100 TB needle query) then
    * scans the full table. The fingerprint is a Bloom-style position
    * set (k Fibonacci-hash positions per value in a power-of-two
    * space): [[readPrunedEquals]] keeps only files whose set contains
    * ALL the probe's positions — no false negatives ever (every value
    * present lit its positions), false positives at the classic
    * `(1−e^(−kn/m))^k` rate just cost a redundant file read. The
    * fingerprint is a FLAT `fpBits/8`-byte bitmap per (file, column) —
    * 16 KB at the default 2¹⁷ — and parquet RLE squeezes the zeros
    * when a file holds few values, so size the space for the expected
    * per-file distinct count (`fpBits ≈ 20·n` keeps FP ≈ 10⁻⁴ at
    * k=4). Build cost is one extra shuffle of (file, position) pairs
    * — map-side combined into per-file bitmaps — next to the stats
    * pass. */
  def statsIndexFingerprint(spark: org.apache.spark.sql.SparkSession,
                            path: String, cols: Seq[String],
                            fpCols: Seq[String],
                            fpBits: Int = 1 << 17,
                            fpHashes: Int = 4): DataFrame = {
    require(cols.nonEmpty, "Layout.statsIndexFingerprint: no columns")
    require(fpCols.nonEmpty, "Layout.statsIndexFingerprint: no fingerprint columns")
    indexOf(spark.read.parquet(path), cols, fpCols, fpBits, fpHashes)
  }

  /** Incrementally extend a [[statsIndex]] with stats for files that
    * appeared since it was built — the natural companion of append-only
    * ingest: a streaming sink litters the directory with per-trigger
    * files, and re-scanning 100 TB to refresh the manifest would defeat
    * its purpose. One driver-side listing (|files| entries — the same
    * cost [[readPruned]] already accepts) diffs the directory against
    * the index; ONLY the new files are scanned, their stats unioned
    * onto the existing rows. Deleted/compacted-away files are dropped
    * from the index (their data is gone; stale entries would make
    * [[readPruned]] fail on missing paths). Hive-partitioned layouts
    * are walked recursively; index DATA columns only — a partition
    * column's values live in directory names, which the new-files-only
    * read cannot see (and partition pruning already covers them).
    * Equality with a full rebuild is pinned by LayoutSpec. */
  def statsIndexUpdate(spark: org.apache.spark.sql.SparkSession, path: String,
                       cols: Seq[String], index: DataFrame): DataFrame = {
    require(cols.nonEmpty, "Layout.statsIndexUpdate: no columns")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // scheme-normalized comparison: input_file_name() renders
    // file:///x/y while Path.toString renders file:/x/y — compare by
    // URI path, keep input_file_name's rendering in the index
    def uriPath(s: String): String = new java.net.URI(s).getPath
    // RECURSIVE listing: a hive-partitioned table keeps its files in
    // key=value subdirectories — a top-level listStatus would see none
    // of them and wrongly classify every indexed file as deleted
    val listed = {
      val out = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.Path]()
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) out += st.getPath
      }
      out.toArray
    }
    val listedPaths = listed.map(_.toUri.getPath).toSet
    val indexedFiles = index.select("file").collect().map(_.getString(0))
    val kept = indexedFiles.filter(f => listedPaths.contains(uriPath(f))).toSet
    val keptIndex =
      if (kept.size == indexedFiles.length) index
      else index.filter(col("file").isin(kept.toSeq: _*))
    val indexedPaths = indexedFiles.map(uriPath).toSet
    val fresh = listed.filterNot(f => indexedPaths.contains(f.toUri.getPath))
    if (fresh.isEmpty) keptIndex
    else {
      // a fingerprinted index ([[statsIndexFingerprint]]) declares its
      // own build parameters in fp_bits/fp_k — fresh files get the
      // SAME fingerprints, so the refreshed index stays probe-compatible
      val fields = index.schema.fieldNames.toSet
      val fpCols =
        if (fields.contains("fp_bits"))
          index.schema.fieldNames.collect { case n if n.startsWith("fp_") &&
            n != "fp_bits" && n != "fp_k" => n.stripPrefix("fp_") }.toSeq
        else Nil
      val (fpBits, fpK) =
        if (fpCols.isEmpty) (0, 0)
        else fpParams(index, "Layout.statsIndexUpdate")
      val newStats = indexOf(
        spark.read.parquet(fresh.map(_.toString).toIndexedSeq: _*),
        cols, fpCols, fpBits, fpK)
      keptIndex.unionByName(newStats)
    }
  }

  /** Read only the files whose [[statsIndex]] ranges intersect
    * `[lo, hi]` boxes per column (`bounds`: col → (lo, hi)). The index
    * is consulted driver-side (it is |files| rows — the driver already
    * holds the file listing itself); unindexed columns simply don't
    * prune. Row-level filtering is still the caller's job — this
    * prunes FILES, the reader's row-group stats prune further. */
  def readPruned(spark: org.apache.spark.sql.SparkSession, index: DataFrame,
                 bounds: Map[String, (Long, Long)]): DataFrame = {
    require(bounds.nonEmpty, "Layout.readPruned: no bounds")
    val keep = bounds.foldLeft(lit(true)) { case (acc, (c, (lo, hi))) =>
      acc && col(s"max_$c") >= lo && col(s"min_$c") <= hi
    }
    val files = index.filter(keep).select("file")
      .collect().map(_.getString(0))
    readFileSet(spark, index, files)
  }

  /** Read only the files whose fingerprints can contain ALL the probe
    * equalities (`eqs`: col → value, rendered with the same
    * cast-to-string the build used — pass strings/integers as their
    * canonical text). A file is kept iff, for every probed column, its
    * position set holds every one of the value's `fp_k` hash positions
    * AND the value sits inside the file's min/max when that column is
    * also range-indexed. Files with a NULL fingerprint (no non-null
    * values) can never match a non-null equality — pruned. No false
    * negatives (every ingested value lit its positions at build time);
    * a false positive just reads one redundant file. The membership
    * test runs as a Spark filter over the index — only the surviving
    * file NAMES cross to the driver, so a fat million-file fingerprint
    * index never materializes driver-side. */
  def readPrunedEquals(spark: org.apache.spark.sql.SparkSession,
                       index: DataFrame, eqs: Map[String, Any]): DataFrame = {
    require(eqs.nonEmpty, "Layout.readPrunedEquals: no equality probes")
    val fields = index.schema.fieldNames.toSet
    require(fields.contains("fp_bits"),
      "Layout.readPrunedEquals: index has no fingerprints — build it with " +
        "statsIndexFingerprint")
    val (bits, k) = fpParams(index, "Layout.readPrunedEquals")
    val keep = eqs.foldLeft(lit(true)) { case (acc, (c, v)) =>
      require(fields.contains(s"fp_$c"),
        s"Layout.readPrunedEquals: column $c is not fingerprinted")
      val s = String.valueOf(v)
      val member = (0 until k)
        .map(j => bitTest(col(s"fp_$c"), fpPos(s, j, bits)))
        .reduce(_ && _)
      val boxed =
        if (fields.contains(s"min_$c"))
          col(s"min_$c") <= lit(v) && col(s"max_$c") >= lit(v)
        else lit(true)
      acc && col(s"fp_$c").isNotNull && member && boxed
    }
    val files = index.filter(keep).select("file").collect().map(_.getString(0))
    readFileSet(spark, index, files)
  }

  /** `WHERE key IN (…)` file pruning: keep files that may contain ANY
    * of `values` (union of [[readPrunedEquals]] point probes in one
    * index pass). The membership expression grows O(|values| · fp_k)
    * `array_contains` terms — fine for the multi-tenant / multi-needle
    * lookups this serves (tens to hundreds of keys); a probe list the
    * size of the table is a join, not an index lookup. */
  def readPrunedIn(spark: org.apache.spark.sql.SparkSession,
                   index: DataFrame, column: String,
                   values: Seq[Any]): DataFrame =
    readFileSet(spark, index, filesMaybeContaining(index, column, values,
      "Layout.readPrunedIn"))

  /** Files whose fingerprints may contain ANY of `values` on `column` —
    * the shared probe behind [[readPrunedIn]], [[readPrunedBy]] and
    * [[targetedDelete]]. The membership expression grows
    * O(|values| · fp_k) terms; callers bound |values|. */
  private def filesMaybeContaining(index: DataFrame, column: String,
                                   values: Seq[Any],
                                   who: String): Array[String] = {
    require(values.nonEmpty, s"$who: no probe values")
    val fields = index.schema.fieldNames.toSet
    require(fields.contains("fp_bits"),
      s"$who: index has no fingerprints — build it with statsIndexFingerprint")
    require(fields.contains(s"fp_$column"),
      s"$who: column $column is not fingerprinted")
    val (bits, k) = fpParams(index, who)
    val anyMatch = values.map { v =>
      val s = String.valueOf(v)
      val member = (0 until k)
        .map(j => bitTest(col(s"fp_$column"), fpPos(s, j, bits)))
        .reduce(_ && _)
      val boxed =
        if (fields.contains(s"min_$column"))
          col(s"min_$column") <= lit(v) && col(s"max_$column") >= lit(v)
        else lit(true)
      member && boxed
    }.reduce(_ || _)
    index.filter(col(s"fp_$column").isNotNull && anyMatch)
      .select("file").collect().map(_.getString(0))
  }

  /** The conjunction-of-disjunctions probe [[graft.plans.SkipRewrite]]
    * compiles a `WHERE`'s equality conjuncts into: a file survives iff
    * for EVERY probed column its fingerprint may contain SOME of that
    * column's values (`col = v` is the one-value case, `col IN (…)`
    * the many). One index pass returns BOTH the full indexed-file list
    * (the rewrite diffs it against the scan's listing to find the
    * un-indexed tail) and the surviving files — the index is |files|
    * rows, and the driver already holds the file listing itself. */
  private[graft] def filesForEqualities(index: DataFrame,
                                        probes: Seq[(String, Seq[Any])],
                                        who: String)
      : (Array[String], Array[String]) =
    filesForPredicates(index, probes, Nil, who)

  /** [[filesForEqualities]] plus RANGE conjuncts over the min/max
    * stats: `(col, lo, hi)` keeps files whose `[min, max]` box
    * intersects `[lo, hi]` (an open side passes None). Exclusive query
    * bounds are probed inclusively — conservative, never a false
    * negative. Ranges need only the stats columns, not fingerprints,
    * so a plain [[statsIndex]] serves them too. `boxedIn` carries
    * equality/IN probes over stats-ONLY columns (no fingerprint):
    * a file survives when ANY probed value sits inside its box — the
    * exact per-point check, not the values' envelope, so a sparse
    * IN-list over a range-clustered layout prunes the gaps between
    * its points too. All compares run Spark-side via `lit(v)`, the
    * same ordering the row-level Filter uses. */
  private[graft] def filesForPredicates(index: DataFrame,
                                        eqs: Seq[(String, Seq[Any])],
                                        ranges: Seq[(String, Option[Any], Option[Any])],
                                        who: String,
                                        boxedIn: Seq[(String, Seq[Any])] = Nil)
      : (Array[String], Array[String]) = {
    require(eqs.nonEmpty || ranges.nonEmpty || boxedIn.nonEmpty,
      s"$who: no probes")
    val fields = index.schema.fieldNames.toSet
    lazy val (bits, k) = fpParams(index, who)
    val eqKeep = eqs.map { case (c, values) =>
      require(values.nonEmpty, s"$who: no values for column $c")
      require(fields.contains(s"fp_$c"), s"$who: column $c is not fingerprinted")
      val anyValue = values.map { v =>
        val s = String.valueOf(v)
        val member = (0 until k)
          .map(j => bitTest(col(s"fp_$c"), fpPos(s, j, bits)))
          .reduce(_ && _)
        val boxed =
          if (fields.contains(s"min_$c"))
            col(s"min_$c") <= lit(v) && col(s"max_$c") >= lit(v)
          else lit(true)
        member && boxed
      }.reduce(_ || _)
      col(s"fp_$c").isNotNull && anyValue
    }
    val boxKeep = boxedIn.map { case (c, values) =>
      require(values.nonEmpty, s"$who: no values for column $c")
      require(fields.contains(s"min_$c"),
        s"$who: column $c carries no min/max stats")
      values.map(v => col(s"min_$c") <= lit(v) && col(s"max_$c") >= lit(v))
        .reduce(_ || _)
    }
    val rangeKeep = ranges.map { case (c, lo, hi) =>
      require(fields.contains(s"min_$c"),
        s"$who: column $c carries no min/max stats")
      Seq(lo.map(v => col(s"max_$c") >= lit(v)),
          hi.map(v => col(s"min_$c") <= lit(v)))
        .flatten.reduceOption(_ && _).getOrElse(lit(true))
    }
    val keep = (eqKeep ++ boxKeep ++ rangeKeep).reduce(_ && _)
    // a NULL verdict (all-null stats column) means "cannot contain it"
    val rows = index.select(col("file"), coalesce(keep, lit(false)).as("keep"))
      .collect()
    (rows.map(_.getString(0)),
      rows.filter(_.getBoolean(1)).map(_.getString(0)))
  }

  /** Semi-join file skipping: read only the fact files that may contain
    * a join key the (already-filtered) dimension side actually has —
    * the unpartitioned-table analogue of dynamic partition pruning. At
    * 100 TB the selective-dim star join (`fact ⋈ dim WHERE dim.pred`)
    * spends its time scanning fact files that contain none of the
    * surviving keys; with a membership-fingerprinted index the dim's
    * key set (bounded — a key set the size of the fact table is a join,
    * not an index lookup; `maxKeys` guards the O(|keys| · fp_k) probe
    * expression and the driver collect) prunes the scan to the files
    * that can participate. Row-level filtering and the join itself are
    * still the caller's job; no false negatives, so the joined result
    * is identical to the full scan (oracle-checked by `q_skip_join`). */
  def readPrunedBy(spark: org.apache.spark.sql.SparkSession,
                   index: DataFrame, column: String, dimKeys: DataFrame,
                   maxKeys: Int = 1024): DataFrame = {
    require(dimKeys.schema.length == 1,
      "Layout.readPrunedBy: dimKeys must be a single key column")
    // NULL keys never match an equi-join — they can't select files
    val keys = dimKeys.na.drop().distinct().limit(maxKeys + 1)
      .collect().map(_.get(0))
    require(keys.nonEmpty, "Layout.readPrunedBy: dim side has no keys")
    require(keys.length <= maxKeys,
      s"Layout.readPrunedBy: dim side exceeds $maxKeys distinct keys — " +
        "at that cardinality scan-and-join beats an index probe")
    readFileSet(spark, index,
      filesMaybeContaining(index, column, keys.toSeq, "Layout.readPrunedBy"))
  }

  /** Targeted row deletion (the right-to-be-forgotten shape): remove
    * every row with `column IN (values)` from the parquet directory,
    * REWRITING ONLY the files whose fingerprints say they may hold one
    * of the values — at 100 TB the deletion set touches a handful of
    * files and the other million stay byte-identical (no checksum
    * churn, no cache invalidation, no re-replication). One distributed
    * job regardless of how many files match: the affected files are
    * read as one DataFrame, survivors appended as fresh part files,
    * then the old files dropped and the index refreshed incrementally
    * ([[statsIndexUpdate]] — only the fresh files are scanned; deleted
    * entries fall out). Returns the refreshed index (caller persists
    * it). NOT transactional: between the append and the deletes a
    * concurrent reader can see deleted-rows-still-present (stale, never
    * corrupt); run it as the offline maintenance pass it is. Re-running
    * after success is a no-op — the rewritten files no longer
    * fingerprint-match. `maxValues` bounds the probe expression; a
    * deletion set beyond it is an anti-join rewrite, not an index
    * operation. */
  def targetedDelete(spark: org.apache.spark.sql.SparkSession, path: String,
                     index: DataFrame, column: String, values: Seq[Any],
                     statCols: Seq[String], maxValues: Int = 1024): DataFrame = {
    require(values.length <= maxValues,
      s"Layout.targetedDelete: ${values.length} values exceeds $maxValues — " +
        "a deletion set that large is an anti-join rewrite, not an index op")
    // materialize the index BEFORE touching any files: a caller's
    // just-built index is a LAZY plan over the data directory itself,
    // and re-evaluating it after the deletes below would re-scan the
    // pre-delete file listing — FAILED_READ_FILE.FILE_NOT_EXIST (the
    // round-8 bug). One evaluation, pinned to executor blocks; the
    // index is |files| rows, so this is cheap at any corpus size.
    val pinned = index.localCheckpoint(true)
    val affected = filesMaybeContaining(pinned, column, values,
      "Layout.targetedDelete")
    if (affected.isEmpty) pinned
    else {
      spark.read.parquet(affected.toIndexedSeq: _*)
        // NULL keys are not in the deletion set — `!isin` alone would
        // evaluate to NULL on them and silently drop the rows
        .filter(col(column).isNull || !col(column).isin(values: _*))
        .write.mode("append").parquet(path)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      affected.foreach { f =>
        fs.delete(new org.apache.hadoop.fs.Path(f), false)
      }
      // the session FileStatusCache (warmed by any earlier read of this
      // directory — the index build itself did one) still lists the
      // files just deleted; without an explicit invalidation the next
      // spark.read.parquet(path) plans against the stale listing and
      // dies at execution with FAILED_READ_FILE.FILE_NOT_EXIST
      spark.catalog.refreshByPath(path)
      val refreshed = statsIndexUpdate(spark, path, statCols, pinned)
      // refresh once more: statsIndexUpdate read the fresh files
      // directly, and the returned state must leave ANY same-session
      // reader of the directory with a clean listing
      spark.catalog.refreshByPath(path)
      refreshed
    }
  }

  /** PATH-STABLE targeted deletion — [[targetedDelete]]'s semantics
    * with every affected file rewritten AT ITS OWN PATH (staged
    * sibling + two-rename swap), designed for corpora that maintained
    * artifacts WATCH: no file ever vanishes or appears, so
    *
    *  - a resumed [[graft.streaming.Streams.skippingIndexSink]] /
    *    `bm25IndexSink` / `lshIndexSink` / `ivfPqIndexSink` file
    *    source sees nothing new and never RE-INGESTS the surviving
    *    rows (the double-index hazard of the append-new rewrite —
    *    FileStreamSource tracks processed PATHS);
    *  - version coverage manifests stay valid verbatim (no vanished
    *    entries, nothing to repair, the fresh readers' mutation guard
    *    never trips);
    *  - the fingerprint index stays SOUND untouched: the deleted
    *    values' bits remain set, which can only produce false-positive
    *    file probes, never a miss — refresh for tightness whenever
    *    convenient, not for correctness.
    *
    * A file whose every row is doomed is rewritten to a zero-row
    * parquet file (schema kept) rather than deleted — path stability
    * is the contract. Per-file probe-then-rewrite: a fingerprint
    * false positive costs one file scan, not a rewrite, so re-running
    * after success returns 0. Crash safety: the original is set aside
    * as a dot-file before the replacement renames in, and the
    * self-heal pass at entry restores or clears leftovers — a torn
    * run never leaves a path missing or doubled.
    *
    * CONCURRENCY contract: running against a corpus whose maintained
    * sinks are LIVE is safe BETWEEN their triggers (spec-pinned:
    * "forget under a LIVE maintained sink") — paths never change, so
    * a running query's processed-files log stays valid and its next
    * trigger ingests only genuinely-new files. A reader or trigger
    * MID-TASK over an affected file during the two-rename swap window
    * can observe a transient missing path; Spark's task retry then
    * re-reads the complete post-swap file at the same path, so
    * correctness holds and the worst case is one retried task. What is
    * NOT supported is a second concurrent MUTATOR of the same corpus
    * (two forgets, forget + compaction) — single-maintainer, like
    * every maintenance op here. Returns the rewritten file paths.
    *
    * [[targetedDelete]] (append-new) remains the right shape for a
    * corpus nothing watches: one distributed job over all affected
    * files instead of one per file. */
  def targetedDeleteInPlace(spark: org.apache.spark.sql.SparkSession,
                            path: String, index: DataFrame, column: String,
                            values: Seq[Any],
                            maxValues: Int = 1024): Seq[String] = {
    require(values.nonEmpty, "Layout.targetedDeleteInPlace: no values")
    require(values.length <= maxValues,
      s"Layout.targetedDeleteInPlace: ${values.length} values exceeds " +
        s"$maxValues — a deletion set that large is an anti-join rewrite, " +
        "not an index op")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // self-heal torn swaps from a crashed run BEFORE pinning the
    // caller's index: an aside with its target missing is restored
    // (crash between the two renames); an aside beside a live target
    // is a completed swap's leftover. Order matters — a lazily-built
    // index whose plan scans this directory would fail its checkpoint
    // on the missing target (FILE_NOT_EXIST), and the heal that fixes
    // exactly that state could then never run.
    val asideSuffix = ".graftold"
    var healed = 0
    val it0 = fs.listFiles(p(path), true)
    while (it0.hasNext) {
      val st = it0.next()
      val name = st.getPath.getName
      if (name.startsWith(".") && name.endsWith(asideSuffix)) {
        val orig = new org.apache.hadoop.fs.Path(st.getPath.getParent,
          name.stripPrefix(".").stripSuffix(asideSuffix))
        if (!fs.exists(orig)) {
          if (!fs.rename(st.getPath, orig)) throw new IllegalStateException(
            s"Layout.targetedDeleteInPlace: could not restore $orig from " +
              "its crashed-swap aside — fix the filesystem state first")
          healed += 1
        } else fs.delete(st.getPath, false)
      }
    }
    // restored content under previously-missing paths: drop the
    // session's cached (absent/stale) file statuses before any scan
    if (healed > 0) spark.catalog.refreshByPath(path)
    val pinned = index.localCheckpoint(true)
    val affected = filesMaybeContaining(pinned, column, values,
      "Layout.targetedDeleteInPlace")
    val rewritten = scala.collection.mutable.ArrayBuffer[String]()
    affected.foreach { f =>
      val file = spark.read.parquet(f)
      // probe-then-rewrite: fingerprint false positives cost a scan,
      // not a rewrite — and make a re-run after success a true no-op
      if (!file.filter(col(column).isin(values: _*)).isEmpty) {
        val survivors = file.filter(col(column).isNull ||
          !col(column).isin(values: _*))
        val target = p(f)
        val tmpDir = new org.apache.hadoop.fs.Path(target.getParent,
          s".graftdel_tmp_${target.getName}")
        fs.delete(tmpDir, true)
        // a zero-survivor file still writes: one empty parquet part
        // (schema kept) keeps the PATH alive — the whole contract
        survivors.coalesce(1).write.mode("overwrite")
          .parquet(tmpDir.toString)
        val part = fs.listStatus(tmpDir).map(_.getPath)
          .find(q => q.getName.startsWith("part-") &&
            q.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            s"Layout.targetedDeleteInPlace: staged rewrite of $f " +
              "produced no part file"))
        val aside = new org.apache.hadoop.fs.Path(target.getParent,
          s".${target.getName}$asideSuffix")
        if (!fs.rename(target, aside)) throw new IllegalStateException(
          s"Layout.targetedDeleteInPlace: could not set $f aside — " +
            "nothing mutated for this file; re-run to resume")
        if (!fs.rename(part, target)) throw new IllegalStateException(
          s"Layout.targetedDeleteInPlace: could not install the rewrite " +
            s"at $f — the original is aside and the next run's self-heal " +
            "restores it; re-run to resume")
        fs.delete(aside, false)
        fs.delete(tmpDir, true)
        rewritten += f
      }
    }
    // content changed under unchanged paths: the session's cached file
    // statuses (size/modtime) are stale — same lesson as targetedDelete
    if (rewritten.nonEmpty) spark.catalog.refreshByPath(path)
    rewritten.toSeq
  }

  /** Fingerprint build parameters declared in the index's own rows —
    * an index with fp columns but ZERO rows can't tell us its hash
    * space, so fail with the remedy instead of a bare
    * NoSuchElementException. */
  private def fpParams(index: DataFrame, who: String): (Int, Int) =
    index.select("fp_bits", "fp_k").take(1).headOption match {
      case Some(r) => (r.getInt(0), r.getInt(1))
      case None => throw new IllegalArgumentException(
        s"$who: index has fingerprint columns but no rows — its build " +
          "parameters (fp_bits, fp_k) are unrecoverable; rebuild it with " +
          "statsIndexFingerprint")
    }

  private def readFileSet(spark: org.apache.spark.sql.SparkSession,
                          index: DataFrame, files: Array[String]): DataFrame =
    if (files.isEmpty) {
      // preserve schema on the empty result
      val any = index.select("file").limit(1).collect().map(_.getString(0))
      require(any.nonEmpty,
        "Layout.readFileSet: nothing to read — the index itself is empty, " +
          "so the data schema is unknowable; build the index over a " +
          "non-empty directory first")
      spark.read.parquet(any.toIndexedSeq: _*).limit(0)
    } else spark.read.parquet(files.toIndexedSeq: _*)

  /** Save `df` as a bucketed+sorted catalog table: rows are
    * hash-clustered into `nBuckets` files by `bucketCol` at WRITE time,
    * so joins and aggregations on that key read the co-located layout
    * and skip their shuffle entirely — pay the exchange once when the
    * 100TB table is produced, never again per query. Verified by the
    * LayoutSpec plan assertion (bucketed⋈bucketed has zero Exchange
    * nodes). Requires saveAsTable (bucket metadata lives in the
    * catalog, not the parquet files). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
