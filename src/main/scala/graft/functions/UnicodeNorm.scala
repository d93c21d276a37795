package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unicode_norm(string, form) -> string`: Unicode normalization as a
  * native codegen'd expression — the canonicalization pass a text
  * pipeline runs before hashing/dedup so that visually-identical
  * strings ("café" composed vs decomposed) hash identically. Spark
  * ships no builtin for this; a Scala UDF would break whole-stage
  * codegen around it, so this is the justified custom-`Expression`
  * path (same rationale as `cosine_f`/`fnv64`).
  *
  * The generated code fast-paths `Normalizer.isNormalized` — for the
  * overwhelmingly-already-NFC corpus the cost is a single scan with no
  * allocation, and the UTF8String is returned as-is. NULL in, NULL out.
  * `form` is fixed at plan time (NFC/NFD/NFKC/NFKD).
  */
case class UnicodeNorm(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unicode_norm: unknown form '$form'")

  override def inputTypes: Seq[Shim.AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  private def jform = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, jform)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, jform))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val f = s"java.text.Normalizer.Form.$form"
      s"""
         |java.lang.String $str = $s.toString();
         |if (java.text.Normalizer.isNormalized($str, $f)) {
         |  ${ev.value} = $s;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($str, $f));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
