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
    require(valueCols.forall(!leftCols.contains(_)),
      s"asofJoin: value columns ${valueCols.filter(leftCols.contains)} collide with left columns")
    // The whole right payload travels as ONE struct per right row (never
    // null for a right row, even if every field is null), so the carried
    // match is a consistent single right row — per-column carry would
    // skip genuinely-null fields and mix columns from different rows.
    val payload = struct(valueCols.map(col): _*)
    // tag sides; right rows sort before left at equal ts so same-ts
    // matches. Null-key and null-ts right rows can never match (SQL
    // equality / ASOF inequality semantics, same as DuckDB ASOF) —
    // dropped up front: a null-ts right row would otherwise sort
    // nulls-first and leak its payload onto left rows with no real
    // prior match.
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(right.select(payload).schema.head.dataType))
    val r = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select((keyCol +: tsCol +: valueCols).map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__rv", payload)
      .withColumns(leftCols.filterNot(c => c == keyCol || c == tsCol)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    val cols = leftCols :+ "__side" :+ "__rv"
    val unioned = l.select(cols.map(col): _*).unionByName(r.select(cols.map(col): _*))
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(v => col(s"__rv.$v").as(v)): _*)
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
    // last bucket of the half-open [lo, hi): floor(hi/w), minus one when
    // hi sits exactly on a bucket edge — correct for fractional bounds
    // too (the integer-only floor((hi-1)/w) would drop matches there).
    // greatest() clamps inverted intervals (hi < lo) to a single bucket
    // instead of a descending sequence exploding into huge arrays; the
    // exact predicate then emits nothing for them.
    val loBucket = floor(col(loCol) / bucketWidth)
    val hiBucket = floor(col(hiCol) / bucketWidth) -
      when(col(hiCol) % bucketWidth === 0, 1).otherwise(0)
    val i = intervals.withColumn("__bucket",
      explode(sequence(loBucket, greatest(loBucket, hiBucket))))
    p.join(i, Seq(keyCol, "__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
