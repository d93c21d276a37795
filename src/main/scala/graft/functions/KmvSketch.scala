package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values distinct-count sketches (Bar-Yossef et al. 2002),
  * the engine's DETERMINISTIC approximate-distinct machinery.
  *
  * The sketch of a value set is its `k` smallest DISTINCT hashes in
  * [0, 2^61): a pure ORDER STATISTIC, so unlike a register-randomized
  * HLL it is reproducible bit-for-bit in a SQL oracle, and its merge is
  * EXACT — the k smallest of a union equal the k smallest over the
  * parts' k-smallest (each part retains every hash that could make the
  * union's top-k). Estimate: exact count below k, else
  * `(k−1)·M / kth_min` — approximate in STATISTICS, exact in
  * ARITHMETIC (the q12_kmv_distinct contract,
  * `queries/Relational.scala:322`).
  *
  * Scale shape: a TypedImperativeAggregate whose buffer is a k-bounded
  * tree — map-side partials carry at most k longs per group regardless
  * of group cardinality, the property that lets
  * [[graft.ops.Cdc.aggSnapshotMinMax]] store one sketch per key and
  * [[graft.plans.MvRewrite]] answer distinct-counts over a petabyte
  * base from a kilobyte snapshot.
  *
  * Hashing is the engine's canonical fnv64 over the value's string
  * rendering, FINISHED by a Fibonacci multiply into the top 61 bits
  * (`(h · 0x9E3779B97F4A7C15 mod 2^64) >>> 3`): raw FNV-1a of short
  * sequential strings is badly non-uniform in its low bits (measured
  * ~2× estimate bias on `id_<n>` keys), and the odd-constant multiply
  * redistributes exactly that into uniform high bits. One arithmetic
  * everywhere — [[KmvDistinct]] directly, [[KmvSketchAgg]] into a
  * stored column, and the DuckDB oracle's HUGEINT replay — so direct
  * and snapshot-navigated answers are EQUAL, not merely close.
  */
object Kmv {
  /** Hash domain [0, 2^61): signed-safe in both engines. */
  val M: Long = 1L << 61
  val DefaultK: Int = 64

  /** 0x9E3779B97F4A7C15 (2^64/phi, odd) as a signed long — Java long
    * multiply IS mod-2^64, signed or not. */
  private val C: Long = 0x9E3779B97F4A7C15L

  /** Raw 64-bit hash → uniform [0, 2^61): Fibonacci-multiply then keep
    * the top 61 bits (logical shift — the sign bit is data here). */
  def mix(h: Long): Long = (h * C) >>> 3

  def hashString(s: String): Long = mix(graft.ops.Dedup.strHash64(s))

  /** The estimator both eval paths and the SQL oracle share. Spark's
    * Round (BigDecimal HALF_UP) — NOT math.round (floor(x+0.5)) — so a
    * Column-side round() of the same quotient agrees. */
  def estimate(sorted: Array[Long], k: Int): Long =
    if (sorted.length < k) sorted.length.toLong
    else java.math.BigDecimal
      .valueOf((k - 1).toDouble * M.toDouble / sorted(k - 1).toDouble)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
}

/** Shared buffer/serde for the KMV family: a k-bounded sorted set of
  * distinct hashes. Insertion keeps only values that can still be among
  * the k smallest, so the buffer never exceeds k entries. */
abstract class KmvAggBase
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  // NO require(k >= 2) here: Java deserialization materializes the
  // instance with default field values before filling them, so a
  // constructor-body require aborts every executor-side deserialize.
  // Validation lives at the construction surfaces (Sketches methods,
  // the SQL function builders, MvRewrite registration).
  def k: Int

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Insert a RAW 64-bit hash: mixed into [0, M) first. */
  protected final def insertRaw(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    insertMixed(buf, Kmv.mix(h))

  /** Insert an ALREADY-MIXED value (a stored sketch element) — the mix
    * is not idempotent, so merge paths must never re-apply it. */
  protected final def insertMixed(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insertMixed(b1, it.next())
    b1
  }

  protected final def sortedArray(buf: java.util.TreeSet[java.lang.Long]): Array[Long] = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}

/** `kmv_sketch(hash, k)` — sketch over RAW 64-bit hashes (fnv64
  * output; the Fibonacci mix into [0, M) happens on insert) as a
  * sorted `array<bigint>` column: the parquet-storable partial an
  * incremental pipeline materializes once per key. */
case class KmvSketchAgg(
    child: Expression,
    k: Int = Kmv.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvAggBase with ExpectsInputTypes {

  override def inputTypes: Seq[Shim.AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insertRaw(buf, v.asInstanceOf[Long])
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    new GenericArrayData(sortedArray(buf))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** `kmv_union(sketch_array, k)` — merge stored [[KmvSketchAgg]]
  * sketches up a hierarchy; returns the merged sorted array. Exact:
  * equals the sketch built from the union of the original values. */
case class KmvUnionAgg(
    child: Expression,
    k: Int = Kmv.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvAggBase with ExpectsInputTypes {

  override def inputTypes: Seq[Shim.AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_union"

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) { insertMixed(buf, arr.getLong(i)); i += 1 }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    new GenericArrayData(sortedArray(buf))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvUnionAgg =
    copy(child = newChild)
}

/** `kmv_union_est(sketch_array, k)` — merge stored sketches and return
  * the distinct-count ESTIMATE directly: what
  * [[graft.plans.MvRewrite]] substitutes for `kmv_distinct` /
  * `approx_count_distinct` over a registered base. Shares
  * [[Kmv.estimate]] with [[KmvDistinct]], so snapshot-navigated and
  * direct answers are identical. */
case class KmvUnionEstimate(
    child: Expression,
    k: Int = Kmv.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvAggBase with ExpectsInputTypes {

  override def inputTypes: Seq[Shim.AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_union_est"

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) { insertMixed(buf, arr.getLong(i)); i += 1 }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    Kmv.estimate(sortedArray(buf), k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvUnionEstimate =
    copy(child = newChild)
}

/** `kmv_distinct(value[, k])` — the user-facing deterministic
  * approximate-distinct aggregate: hashes each value's string rendering
  * with fnv64 and returns [[Kmv.estimate]] — exact below k distinct
  * values, `(k−1)·M / kth_min` beyond. The aggregate
  * [[graft.plans.MvRewrite]] can answer from a maintained snapshot's
  * `kmv_<col>` column without touching the base table. */
case class KmvDistinct(
    child: Expression,
    k: Int = Kmv.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvAggBase
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[Shim.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null)
      insertRaw(buf, graft.ops.Dedup.strHash64(v.asInstanceOf[UTF8String].toString))
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    Kmv.estimate(sortedArray(buf), k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}
