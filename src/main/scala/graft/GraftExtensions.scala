package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.CosineSimilarityF

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst functions so SQL text can call them
  * (`SELECT cosine_f(a.embedding, b.embedding) ...`). Enabled via
  * `spark.sql.extensions=graft.GraftExtensions` (Engine sets it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_f"),
      new ExpressionInfo(classOf[CosineSimilarityF].getName, "cosine_f"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarityF(children(0), children(1))))
  }
}
