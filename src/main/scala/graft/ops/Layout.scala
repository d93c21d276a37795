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
