package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: MERGE a change batch (upserts + deletes,
  * each stamped with a monotonic sequence) into a snapshot — the
  * incremental-ingestion primitive behind corpus versioning, label
  * fixups, and takedown compliance at 100 TB, where rewriting the
  * corpus per delta is not an option but replaying a day's changes is.
  *
  * Scale shape: the snapshot is the big side and is touched exactly
  * once, by a key anti-join that BROADCASTS the (tiny) change-key set
  * when it fits — the normal CDC regime is |changes| ≪ |snapshot|, so
  * the snapshot never shuffles at all; latest-change-per-key reduction
  * shuffles only the change batch. Both joins are equi-joins on the
  * merge key; nothing collects to the driver.
  */
object Cdc {

  /** Latest change per key (by `seqCol`, descending) applied to
    * `target`: delete rows win by vanishing, upserts replace or append.
    * `changes` must carry `target`'s columns plus `seqCol` and a
    * boolean `deleteCol`; (key, seq) pairs must be unique (the CDC
    * source's ordering contract — ties would make "latest" undefined).
    */
  def mergeUpsert(target: DataFrame, changes: DataFrame, keyCols: Seq[String],
                  seqCol: String, deleteCol: String): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.mergeUpsert: empty key")
    val keyCs = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCs: _*).orderBy(col(seqCol).desc)
    val latest = changes.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
    val survivors = target.join(
      broadcast(latest.select(keyCs: _*).distinct()), keyCols, "left_anti")
    val upserts = latest.filter(!col(deleteCol))
      .select(target.columns.map(col).toIndexedSeq: _*)
    survivors.unionByName(upserts)
  }
}
