package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarityF, MinHashSigAgg, VectorizeCosineRule}

/** SparkSessionExtensions entry point (enabled via
  * `spark.sql.extensions=graft.GraftExtensions`, Engine sets it):
  *  - `cosine_f` as a SQL-callable native function;
  *  - [[VectorizeCosineRule]] optimizer rule rewriting the builtin HOF
  *    cosine composition into the fused codegen expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_f"),
      new ExpressionInfo(classOf[CosineSimilarityF].getName, "cosine_f"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarityF(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigAgg].getName, "minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSigAgg(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[graft.functions.Fnv64].getName, "fnv64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.Fnv64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[graft.functions.UnicodeNorm].getName, "unicode_norm"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val form = children.lift(1) match {
          case Some(org.apache.spark.sql.catalyst.expressions.Literal(v, _)) if v != null =>
            v.toString
          case None => "NFC"
          case other => throw new IllegalArgumentException(
            s"unicode_norm: form must be a string literal, got $other")
        }
        graft.functions.UnicodeNorm(children.head, form)
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert2"),
      new ExpressionInfo(classOf[graft.functions.Hilbert2].getName, "hilbert2"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val bits = children.lift(2) match {
          case Some(org.apache.spark.sql.catalyst.expressions.Literal(v, _)) if v != null =>
            v.toString.toInt
          case None => 8
          case other => throw new IllegalArgumentException(
            s"hilbert2: bits must be an integer literal, got $other")
        }
        graft.functions.Hilbert2(children(0), children(1), bits)
      }))
    // KMV distinct-count family: the deterministic approximate-distinct
    // aggregates MvRewrite can navigate. k is an optional trailing
    // integer literal (default Kmv.DefaultK).
    def kmvK(children: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
             fn: String): Int = {
      val k = children.lift(1) match {
        case Some(org.apache.spark.sql.catalyst.expressions.Literal(v, _)) if v != null =>
          v.toString.toInt
        case None => graft.functions.Kmv.DefaultK
        case other => throw new IllegalArgumentException(
          s"$fn: k must be an integer literal, got $other")
      }
      require(k >= 2, s"$fn: k must be >= 2, got $k")
      k
    }
    ext.injectFunction((
      new FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[graft.functions.KmvDistinct].getName, "kmv_distinct"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.KmvDistinct(children.head, kmvK(children, "kmv_distinct"))))
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[graft.functions.KmvSketchAgg].getName, "kmv_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.KmvSketchAgg(children.head, kmvK(children, "kmv_sketch"))))
    ext.injectFunction((
      new FunctionIdentifier("kmv_union"),
      new ExpressionInfo(classOf[graft.functions.KmvUnionAgg].getName, "kmv_union"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.KmvUnionAgg(children.head, kmvK(children, "kmv_union"))))
    ext.injectFunction((
      new FunctionIdentifier("kmv_union_est"),
      new ExpressionInfo(classOf[graft.functions.KmvUnionEstimate].getName, "kmv_union_est"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.KmvUnionEstimate(children.head, kmvK(children, "kmv_union_est"))))
    ext.injectOptimizerRule(_ => VectorizeCosineRule)
    ext.injectOptimizerRule(_ => graft.plans.MvRewriteRule)
    ext.injectOptimizerRule(_ => graft.plans.GroupedTopKRewriteRule)
    ext.injectOptimizerRule(_ => graft.plans.SkipRewriteRule)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}
