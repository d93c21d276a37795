package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `fnv64(string) -> bigint`: the engine's canonical FNV-1a string
  * hash as a SQL-callable native expression (codegen'd). This is the
  * SAME hash the dedup pipelines normalize with (shingles, tokens,
  * Bloom fingerprints could use it too), so SQL users can reproduce
  * bucket/signature arithmetic without typed Scala — and the DuckDB
  * oracles already mirror it (HUGEINT arithmetic; see the
  * e1_minhash_lsh / e1_simhash oracle SQL).
  *
  * Hashes UTF-16 code units to match `String.charAt` exactly (pure
  * ASCII therefore hashes its bytes). NULL in, NULL out.
  */
case class Fnv64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[Shim.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  override protected def nullSafeEval(input: Any): Any =
    graft.ops.Dedup.strHash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $str = $s.toString();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $str.length(); $i++) {
         |  $h ^= $str.charAt($i);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
