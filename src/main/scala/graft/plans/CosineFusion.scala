package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.CosineSimilarity

/** Optimizer rule: recognize the composed higher-order-function cosine
  * pattern — `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` where `dot` is
  * `aggregate(zip_with(x, y, (p,q) -> p*q), 0.0, (acc,v) -> acc+v)` — and
  * fuse it into the native codegen [[CosineSimilarity]] expression.
  *
  * Callers composing vector math from built-ins (the portable form) get
  * the fused single-loop kernel automatically once `GraftExtensions` is
  * installed; results are bit-identical (ExtensionsSpec proves the two
  * forms equal, CosineFusionSpec proves the rewrite fires). This completes
  * the extension-point tour: injected function, codegen expression,
  * optimizer rule, planner strategy, and exec node.
  */
object CosineFusion extends Rule[LogicalPlan] {

  /** Matches the HOF dot-product shape and returns its two array inputs. */
  private def dotOf(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(mul: Multiply, _, _)),
        zero, LambdaFunction(_: Add, _, _), _)
      if isZeroLiteral(zero) && isLambdaProduct(mul) => Some((a, b))
    case _ => None
  }

  private def isZeroLiteral(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** The zip lambda must be a product of (possibly cast) lambda variables —
    * anything else (e.g. a weighted product) is not a plain dot product.
    */
  private def isLambdaProduct(m: Multiply): Boolean = {
    def isVar(e: Expression): Boolean = e match {
      case _: NamedLambdaVariable => true
      case Cast(c, _, _, _) => isVar(c)
      case _ => false
    }
    isVar(m.left) && isVar(m.right)
  }

  private def supported(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case d @ Divide(dot, Multiply(Sqrt(na), Sqrt(nb), _), _) =>
      (dotOf(dot), dotOf(na), dotOf(nb)) match {
        case (Some((a, b)), Some((a1, a2)), Some((b1, b2)))
            if a1.semanticEquals(a) && a2.semanticEquals(a) &&
               b1.semanticEquals(b) && b2.semanticEquals(b) &&
               supported(a) && supported(b) =>
          CosineSimilarity(a, b)
        case _ => d
      }
  }
}
