package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively (SURVEY §2 custom-op
  * slot "compose existing ops if semantics allow" — both compose).
  */
object TemporalJoins {

  /** As-of join: for each left row, attach the most recent right row
    * with `right.ts <= left.ts` for the same key (ties at equal ts
    * match; right must be unique per (key, ts) — pre-aggregate if not).
    *
    * Implementation is the union-sweep, NOT a per-row subquery or a
    * range cross-join: union both sides tagged, one shuffle+sort on
    * (key, ts, side), then `last(ignoreNulls)` over the running frame
    * carries the latest right payload forward onto each left row.
    * O(n log n) per key-partition, single shuffle — at 100TB this is a
    * sort-merge pass, never a quadratic probe.
    *
    * @param valueCols right-side payload columns to attach
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag sides; right rows sort before left at equal ts so same-ts matches
    val l = left.withColumn("__side", lit(1))
      .withColumns(valueCols.map(v => v -> lit(null).cast(right.schema(v).dataType)).toMap)
    val r = right.select((keyCol +: tsCol +: valueCols).map(col): _*)
      .withColumn("__side", lit(0))
      .withColumns(leftCols.filterNot(c => c == keyCol || c == tsCol)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    val unioned = l.select((leftCols ++ valueCols :+ "__side").map(col): _*)
      .unionByName(r.select((leftCols ++ valueCols :+ "__side").map(col): _*))
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(when(col("__side") === 0, col(v)), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** Range (interval-containment) join: pairs (point, interval) with
    * `lo <= point < hi`, equi-key optional. The scalable shape: both
    * sides bucketized by `bucketWidth`, intervals exploded over every
    * bucket they overlap, hash equi-join on (key, bucket), exact
    * predicate afterwards — a banded nested loop never sees more than
    * one bucket's cross product, vs the full cross-join Spark would
    * otherwise plan for a pure range predicate.
    *
    * `bucketWidth` should be on the order of typical interval length:
    * too small explodes intervals into many buckets, too large makes
    * buckets crowded.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCol: String,
                pointCol: String, loCol: String, hiCol: String,
                bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    val i = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth), floor((col(hiCol) - 1) / bucketWidth))))
    p.join(i, Seq(keyCol, "__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
