package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType}

/** Fixed-size Bloom bitmap for the file-skipping fingerprint index
  * ([[graft.ops.Layout.statsIndexFingerprint]]).
  *
  * Why a bitmap and not a position SET: at high per-file cardinality a
  * sparse set of k·n int positions is as large as the indexed column
  * itself and membership degenerates to a linear `array_contains`
  * scan; the bitmap is `bits/8` bytes FLAT (parquet RLE squeezes the
  * zeros when sparse) and membership is one bit test — the same
  * trade every production bloom filter (Parquet's own, ORC's) makes.
  * OR-merge is commutative, so the built bytes are identical under any
  * row order/partitioning — rebuild equality needs no sorting.
  */

/** `bloom_bitmap(pos, bytesLen)` — aggregate bit positions (ints in
  * `[0, 8·bytesLen)`) into a `bytesLen`-byte bitmap. Bit `p` lives at
  * byte `p >> 3`, mask `1 << (p & 7)`. */
case class BloomBitmapAgg(
    child: Expression,
    bytesLen: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[Shim.AbstractDataType] = Seq(IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_bitmap"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](bytesLen)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val p = v.asInstanceOf[Int]
      buf(p >> 3) = (buf(p >> 3) | (1 << (p & 7))).toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBitmapAgg =
    copy(child = newChild)
}

/** `bitmap_contains(bitmap, pos)` — is bit `pos` set. One array read
  * per probe (codegen'd), against `array_contains`' linear scan over a
  * position set. NULL bitmap (a file with no non-null values) yields
  * NULL, which filters as false — exactly "cannot contain". */
case class BitmapContains(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Shim.AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bitmap_contains"

  override protected def nullSafeEval(bitmap: Any, pos: Any): Any = {
    val bytes = bitmap.asInstanceOf[Array[Byte]]
    val p = pos.asInstanceOf[Int]
    (p >> 3) < bytes.length && ((bytes(p >> 3) >> (p & 7)) & 1) == 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, p) =>
      s"${ev.value} = ($p >> 3) < $b.length && ((($b[$p >> 3]) >> ($p & 7)) & 1) == 1;")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
