package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for unsplittable inputs (optimization guide
  * §2.5 "input skew: one huge unsplittable file … otherwise repartition
  * immediately after the read").
  *
  * Parquet parallelizes a scan at row-group granularity; a file with a
  * single row group is one task no matter how many byte-range splits
  * `spark.sql.files.maxPartitionBytes` carves (each row group is read
  * by the split holding its start offset). The local test tables are
  * exactly that shape — one file, one row group — so every scan-stage
  * computation (expression evaluation, partial aggregation, broadcast-
  * join probes) runs on ONE core of `local[32]` unless repaired.
  *
  * [[scan]] round-robin-repartitions such a scan to the session's
  * default parallelism so downstream per-row work uses every core. It
  * is a deliberate no-op when the scan already yields at least the
  * default parallelism (a real 100 TB layout: thousands of row groups)
  * or when the input is too big for a repartition to be a reasonable
  * trade (> [[maxRepartitionBytes]]), so at cluster scale no extra
  * exchange appears. The repartition count is the session's default
  * parallelism — scale-adaptive, never a constant tuned to one host.
  */
object Par {

  /** Ceiling above which repairing parallelism via a full round-robin
    * shuffle is judged worse than living with the skewed scan. */
  private val maxRepartitionBytes: Long = 4L << 30

  def scan(df: DataFrame): DataFrame = {
    // measurement kill-switch for A/B timing of the repair itself
    if (sys.env.contains("SPARK_GRAFT_NO_PAR")) return df
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    // KNOWN LIMIT (deliberate): getNumPartitions counts byte-range
    // SPLITS, not row groups — a single-row-group file LARGER than
    // maxPartitionBytes is carved into >= target mostly-empty splits
    // and the repair no-ops even though only one task carries rows.
    // Detecting that case needs parquet footer row-group counts (a
    // driver-side footer read per file); the local test tables sit
    // far below maxPartitionBytes so the split count is exact here,
    // and on real layouts (many row groups) the no-op is correct.
    // `.rdd` also finalizes this scan's AQE plan eagerly at
    // query-construction time — acceptable for a leaf scan.
    val scanParts = df.rdd.getNumPartitions
    if (scanParts >= target) df
    else {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (bytes > maxRepartitionBytes) df else df.repartition(target)
    }
  }
}
