package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import graft.ops.Dedup

/** `minhash_sig(hash)` — native SQL aggregate computing the K-min
  * MinHash signature of a group of 64-bit shingle hashes (SURVEY §7.3:
  * the custom-aggregate rung of the extension ladder; same hash family
  * as [[graft.ops.Dedup.minhashSignatures]], so outputs are equal).
  *
  * TypedImperativeAggregate: the buffer is a primitive long[K] mutated
  * in place — partial signatures fold map-side and merge as
  * element-wise min, so the shuffle carries K longs per group however
  * many shingles a group has (the same property the typed Dataset path
  * gets; this one is for the SQL surface: GROUP BY doc over exploded
  * shingles). Null inputs are ignored; a group with no non-null input
  * yields NULL (no signature is defined for the empty set).
  */
case class MinHashSigAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[Shim.AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(Dedup.K)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val hm = ((h % Dedup.P) + Dedup.P) % Dedup.P
      var k = 0
      while (k < Dedup.K) {
        val x = (Dedup.A(k) * hm + Dedup.B(k)) % Dedup.P
        if (x < buf(k)) buf(k) = x
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < Dedup.K) {
      if (b2(k) < b1(k)) b1(k) = b2(k)
      k += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) null else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * Dedup.K)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(Dedup.K)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSigAgg =
    copy(child = newChild)
}
