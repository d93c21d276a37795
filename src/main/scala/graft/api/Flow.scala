package graft.api

import org.apache.spark.sql.{Dataset, DataFrame, Encoder, KeyValueGroupedDataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed dataflow facade mirroring the reference's `DataStream` surface —
  * "datastream.map.flatmap.reduce.sink — every operator is a function"
  * (reference: flink_arch.drawio:1, page "DataStream分析").
  *
  * Thin wrapper over `Dataset[T]`: every combinator delegates to the
  * declarative Dataset API so Catalyst still sees the whole plan
  * (operator chaining ≙ WholeStageCodegen; reference `setChaining`/
  * `createChain`, drawio page "StreamGraph-JobGraph-ExecutorGraph生成过程").
  * Works identically for batch and streaming datasets — the reference's
  * translateForBatch/translateForStreaming split is `read` vs `readStream`.
  */
final class Flow[T](val ds: Dataset[T]) extends Serializable {

  /** T1 `map` (drawio page "DataStream分析": StreamMap.processElement). */
  def map[U: Encoder](f: T => U): Flow[U] = new Flow(ds.map(f))

  /** T2 `flatMap` (lazy: the function's iterator is consumed, never
    * materialized). */
  def flatMap[U: Encoder](f: T => IterableOnce[U]): Flow[U] =
    new Flow(ds.flatMap(f))

  /** T3 `filter`. */
  def filter(p: T => Boolean): Flow[T] = new Flow(ds.filter(p))

  /** T4 `keyBy` — hash partitioning by key, prerequisite of keyed state. */
  def keyBy[K: Encoder](f: T => K): KeyedFlow[K, T] = new KeyedFlow(ds.groupByKey(f))

  /** T6 `transform(...)` escape hatch: arbitrary per-partition operator. */
  def mapPartitions[U: Encoder](f: Iterator[T] => Iterator[U]): Flow[U] =
    new Flow(ds.mapPartitions(f))

  /** Q7 union. */
  def union(other: Flow[T]): Flow[T] = new Flow(ds.union(other.ds))

  /** T7 join (typed equi-join on extracted keys). */
  def joinWith[U](other: Flow[U], cond: org.apache.spark.sql.Column, joinType: String = "inner"): Flow[(T, U)] =
    new Flow(ds.joinWith(other.ds, cond, joinType))

  /** Side-output split (Flink v1.12 `DataStream.split` / `OutputTag`
    * shape): each element is routed to the FIRST tag whose predicate
    * matches — tags are ordered and mutually exclusive by construction,
    * so the outputs partition the matched elements exactly like
    * side-output tags do (an element never lands in two outputs).
    * Elements matching no tag are dropped (Flink's untagged default).
    *
    * Each returned flow is a typed filter over the SAME source plan, so
    * a consumer reading only one side output scans once — but the tag
    * predicates are Scala lambdas, opaque to Catalyst: they do NOT push
    * into the source scan (use Column predicates + `filter(Column)`
    * when scan pruning matters), and the i-th output re-evaluates the
    * i−1 preceding predicates per element to enforce first-match
    * routing (O(k) per row for the last tag — keep tag lists short).
    * Consumers reading several outputs should cache/persist the
    * upstream first — same guidance Flink gives for multi-sink
    * fan-out. */
  def split(tags: (String, T => Boolean)*): Map[String, Flow[T]] = {
    require(tags.map(_._1).distinct.size == tags.size, "split: duplicate tag names")
    tags.zipWithIndex.map { case ((name, _), i) =>
      val before = tags.take(i).map(_._2)
      val p = tags(i)._2
      name -> new Flow(ds.filter(t => p(t) && !before.exists(q => q(t))))
    }.toMap
  }

  /** [[split]] with Column predicates — the pushdown-friendly variant:
    * each output filters the shared source with a Catalyst expression,
    * so the tag's own predicate reaches the scan RAW (PushedFilters —
    * wrapping it null-safe would block parquet filter translation,
    * measured in FlowSpec), evaluation is codegen'd, and the
    * O(k)-lambda-calls-per-row cost of the typed variant disappears
    * into one fused conjunction. First-match routing is enforced the
    * same way: output i keeps rows matching tag i and none of the
    * earlier tags, where "matching" is three-valued-safe — an earlier
    * tag whose predicate is NULL counts as not-matched (`<=> true`),
    * and a NULL own-predicate routes the row nowhere (filter keeps
    * only TRUE), so no element ever lands in two outputs. */
  def splitCols(tags: (String, org.apache.spark.sql.Column)*): Map[String, Flow[T]] = {
    import org.apache.spark.sql.functions.lit
    require(tags.map(_._1).distinct.size == tags.size, "splitCols: duplicate tag names")
    tags.zipWithIndex.map { case ((name, p), i) =>
      val notEarlier = tags.take(i).map { case (_, q) => !(q <=> lit(true)) }
      val full = notEarlier.foldLeft(p)(_ && _)
      name -> new Flow(ds.filter(full))
    }.toMap
  }

  /** W3 windowed keyed aggregation — the reference's
    * `keyBy(...).window(TumblingEventTimeWindows.of(...)).aggregate(...)`
    * surface as ONE typed API for batch and streaming (`window()` /
    * `session_window()` group identically in both; `withWatermark` is a
    * no-op on batch datasets — the facade's translateForBatch/
    * translateForStreaming promise). Extractors pick the key, event
    * time and value; output is (key, window_start_ms, cnt, sum).
    * Declarative underneath ([[graft.streaming.Streams.tumblingAgg]]
    * family), so Catalyst plans the partial-aggregate + single keyed
    * exchange shape. */
  def windowCountSum[K: Encoder](keyF: T => K, tsF: T => java.sql.Timestamp,
                                 valF: T => Double, watermark: String,
                                 width: String)(
      implicit row: Encoder[(K, java.sql.Timestamp, Double)],
      out: Encoder[(K, Long, Long, Double)]): Flow[(K, Long, Long, Double)] =
    windowed(keyF, tsF, valF, df => graft.streaming.Streams.tumblingAgg(
      df, "ts", watermark, width, Seq("k"), countSumAggs))

  /** W3 sliding variant: each element lands in width/slide windows. */
  def slidingWindowCountSum[K: Encoder](keyF: T => K, tsF: T => java.sql.Timestamp,
                                        valF: T => Double, watermark: String,
                                        width: String, slide: String)(
      implicit row: Encoder[(K, java.sql.Timestamp, Double)],
      out: Encoder[(K, Long, Long, Double)]): Flow[(K, Long, Long, Double)] =
    windowed(keyF, tsF, valF, df => graft.streaming.Streams.slidingAgg(
      df, "ts", watermark, width, slide, Seq("k"), countSumAggs))

  /** W3 session variant (`EventTimeSessionWindows.withGap`): output
    * carries (key, start_ms, end_ms, cnt, sum) — session ends are
    * data-dependent, unlike the fixed-width windows above. */
  def sessionWindowCountSum[K: Encoder](keyF: T => K, tsF: T => java.sql.Timestamp,
                                        valF: T => Double, watermark: String,
                                        gap: String)(
      implicit row: Encoder[(K, java.sql.Timestamp, Double)],
      out: Encoder[(K, Long, Long, Long, Double)]): Flow[(K, Long, Long, Long, Double)] = {
    import org.apache.spark.sql.functions.{col, unix_millis}
    val rows = ds.map(t => (keyF(t), tsF(t), valF(t))).toDF("k", "ts", "v")
    val agg = graft.streaming.Streams.sessionAgg(
      rows, "ts", watermark, gap, Seq("k"), countSumAggs)
    new Flow(agg.select(col("k"), unix_millis(col("session.start")),
        unix_millis(col("session.end")), col("cnt"), col("sum_v"))
      .as[(K, Long, Long, Long, Double)])
  }

  private def countSumAggs: Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.{functions => F}
    Seq(F.count(F.lit(1)).as("cnt"), F.sum(F.col("v")).as("sum_v"))
  }

  private def windowed[K: Encoder](keyF: T => K, tsF: T => java.sql.Timestamp,
                                   valF: T => Double,
                                   agg: DataFrame => DataFrame)(
      implicit row: Encoder[(K, java.sql.Timestamp, Double)],
      out: Encoder[(K, Long, Long, Double)]): Flow[(K, Long, Long, Double)] = {
    import org.apache.spark.sql.functions.{col, unix_millis}
    val rows = ds.map(t => (keyF(t), tsF(t), valF(t))).toDF("k", "ts", "v")
    new Flow(agg(rows).select(col("k"), unix_millis(col("window.start")),
        col("cnt"), col("sum_v"))
      .as[(K, Long, Long, Double)])
  }

  /** S6 sinks. Batch parquet sink; `print` ≙ reference's print() sink. */
  def sinkParquet(path: String): Unit = ds.write.mode("overwrite").parquet(path)

  /** Hive-style partitioned parquet sink — the 100TB table layout:
    * readers filtering on the partition columns prune whole directories
    * at planning time (PartitionFilters in the scan) instead of reading
    * and discarding rows. Pick low-cardinality columns; a
    * high-cardinality partition key makes a small-files problem. */
  def sinkParquetPartitioned(path: String, partitionCols: String*): Unit =
    ds.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  def print(n: Int = 20): Unit = ds.show(n, truncate = false)

  def toDF: DataFrame = ds.toDF()
  def count(): Long = ds.count()
  def collectSeq(): Seq[T] = ds.collect().toSeq
}

/** Keyed stream: reference's `KeyedStream` (implied by keyBy/reduce/sum,
  * SURVEY §2.2 T4/T5/T8; keyed state in managed memory per drawio page
  * "Flink memory" ≙ Structured Streaming state store). */
final class KeyedFlow[K, T](val kv: KeyValueGroupedDataset[K, T]) extends Serializable {

  /** T5 keyed `reduce`. Batch semantics: final value per key (Flink's
    * rolling emission is per-record; divergence documented in SURVEY §7.4.1 —
    * for per-record emission in streaming use [[flatMapWithState]]). */
  def reduce(f: (T, T) => T)(implicit e: Encoder[(K, T)]): Flow[(K, T)] =
    new Flow(kv.reduceGroups(f))

  def mapGroups[U: Encoder](f: (K, Iterator[T]) => U): Flow[U] = new Flow(kv.mapGroups(f))

  def flatMapGroups[U: Encoder](f: (K, Iterator[T]) => IterableOnce[U]): Flow[U] =
    new Flow(kv.flatMapGroups((k: K, it: Iterator[T]) => f(k, it).iterator.to(Iterable)))

  /** T8 `sum`-style counting (WordCount: drawio page "yarn per job 启动流程"). */
  def count()(implicit e: Encoder[(K, Long)]): Flow[(K, Long)] = new Flow(kv.count())

  /** T8 keyed sum over a numeric projection of the element — the
    * reference's `keyBy(...).sum(...)` shape. Map-side partial
    * aggregation (agg over groupByKey), not a reduceGroups scan. */
  def sumBy(f: T => Double): Flow[(K, Double)] = {
    val agg = new org.apache.spark.sql.expressions.Aggregator[T, Double, Double] {
      override def zero: Double = 0.0
      override def reduce(b: Double, a: T): Double = b + f(a)
      override def merge(b1: Double, b2: Double): Double = b1 + b2
      override def finish(r: Double): Double = r
      override def bufferEncoder: Encoder[Double] = org.apache.spark.sql.Encoders.scalaDouble
      override def outputEncoder: Encoder[Double] = org.apache.spark.sql.Encoders.scalaDouble
    }
    new Flow(kv.agg(agg.toColumn))
  }

  /** Keyed min/max by a numeric projection (rolling-aggregate family).
    * Total order via Double.compare — NaN sorts greatest (Spark's sort
    * semantics), so results are deterministic on NaN-bearing data; ties
    * under f pick an arbitrary element (project a unique tiebreaker
    * into f if that matters). */
  def minBy(f: T => Double)(implicit e1: Encoder[T], e: Encoder[(K, T)]): Flow[(K, T)] =
    new Flow(kv.reduceGroups((a: T, b: T) =>
      if (java.lang.Double.compare(f(a), f(b)) <= 0) a else b))
  def maxBy(f: T => Double)(implicit e1: Encoder[T], e: Encoder[(K, T)]): Flow[(K, T)] =
    new Flow(kv.reduceGroups((a: T, b: T) =>
      if (java.lang.Double.compare(f(a), f(b)) >= 0) a else b))

  /** W6 custom keyed stateful op (ProcessFunction-shaped, SURVEY §2.4). */
  def flatMapWithState[S: Encoder, U: Encoder](
      outputMode: OutputMode,
      timeout: GroupStateTimeout)(
      f: (K, Iterator[T], GroupState[S]) => Iterator[U]): Flow[U] =
    new Flow(kv.flatMapGroupsWithState(outputMode, timeout)(f))
}

object Flow {
  /** S1 `readTextFile` (batch): dataset of lines. */
  def fromText(spark: SparkSession, path: String): Flow[String] =
    new Flow(spark.read.textFile(path))

  /** S7 collection source / local debugging (≙ executeOnCollections). */
  def fromCollection[T: Encoder](spark: SparkSession, data: Seq[T]): Flow[T] =
    new Flow(spark.createDataset(data))

  def fromDataset[T](ds: Dataset[T]): Flow[T] = new Flow(ds)

  /** S3 `readFile(..., PROCESS_CONTINUOUSLY, interval)`: monitored
    * directory as an unbounded stream of lines (FileStreamSource does the
    * driver-side discovery + distributed read the reference traces in
    * ContinuousFileMonitoringFunction/ContinuousFileReaderOperator). */
  def fromTextStream(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 1): Flow[String] = {
    import spark.implicits._
    new Flow(spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(path).as[String])
  }
}
