package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `((hash ^ salt) · φ) >>> shift` — the Fibonacci-hash position a
  * value lights up in a power-of-two fingerprint space
  * ([[graft.ops.Layout.statsIndexFingerprint]]). High-bits extraction,
  * the [[KmvSketch]] house arithmetic: a power-of-two modulus of the
  * product would depend only on the LOW operand bits. A native
  * expression because the multiply must WRAP (mod 2⁶⁴ arithmetic) —
  * ANSI-mode SQL `*` throws on Long overflow — and because it keeps
  * the index build inside whole-stage codegen. The driver-side probe
  * recomputes the identical arithmetic in plain Scala
  * ([[graft.ops.Layout.fpPos]]). NULL in, NULL out.
  */
case class FibonacciPos(child: Expression, salt: Long, shift: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Shim.AbstractDataType] = Seq(LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "fib_pos"

  override protected def nullSafeEval(input: Any): Any =
    (((input.asInstanceOf[Long] ^ salt) * 0x9E3779B97F4A7C15L) >>> shift).toInt

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (int) ((($s ^ ${salt}L) * 0x9E3779B97F4A7C15L) >>> $shift);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
