package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}

/** `hilbert2(a, b)` → Hilbert-curve index over a 2^bits × 2^bits grid,
  * as a native codegen'd expression. The xy→d walk is inherently
  * ITERATIVE with coordinate swaps; composed `Column` case-whens would
  * duplicate each level's sub-expressions into the next (each of
  * x'/y' references both x and y), an exponential 4^bits expression
  * tree that OOMs Catalyst conversion at bits=8 — measured, which is
  * why this is a loop in generated code instead (the same
  * preference-ladder step as `cosine_f`/`fnv64`: native Expression
  * over expression composition when composition can't express a loop).
  *
  * NULL in, NULL out. Inputs are masked into [0, 2^bits).
  */
case class Hilbert2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 31, s"hilbert2: bits must be in [1,31], got $bits")

  override def inputTypes: Seq[Shim.AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hilbert2.index(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val mask = (1L << bits) - 1
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hilbert2 {
  /** The reference walk (shared by interpreted eval and specs). */
  def index(aIn: Long, bIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = aIn & mask
    var y = bIn & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
