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

  /** Matches the HOF dot-product shape and returns its two array inputs.
    *
    * The match is strict, not structural-ish: the merge lambda must be
    * exactly `(acc, v) -> acc + v` over its own two declared variables
    * (an `acc + abs(v)` or `acc + v + 1` fold is NOT a dot product), and
    * the finish lambda must be the identity (`acc -> acc` — the form
    * `functions.aggregate` emits when no finish is given). Anything looser
    * would rewrite folds that merely *contain* an Add into plain cosine
    * and silently change results.
    */
  private def dotOf(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(mul: Multiply, _, _)),
        zero,
        LambdaFunction(add: Add, mergeArgs, _),
        LambdaFunction(finBody, finArgs, _))
      if isZeroLiteral(zero) && isLambdaProduct(mul) &&
         isPlainSum(add, mergeArgs) && isIdentity(finBody, finArgs) => Some((a, b))
    case _ => None
  }

  /** The merge must be an Add whose operands are exactly the two declared
    * lambda variables (in either order — IEEE double addition commutes).
    */
  private def isPlainSum(add: Add, args: Seq[NamedExpression]): Boolean = args match {
    case Seq(x: NamedLambdaVariable, y: NamedLambdaVariable) =>
      def is(e: Expression, v: NamedLambdaVariable): Boolean = e match {
        case n: NamedLambdaVariable => n.exprId == v.exprId
        case _ => false
      }
      (is(add.left, x) && is(add.right, y)) || (is(add.left, y) && is(add.right, x))
    case _ => false
  }

  /** The finish lambda must be the identity: its body is its own single
    * declared variable.
    */
  private def isIdentity(body: Expression, args: Seq[NamedExpression]): Boolean =
    args match {
      case Seq(v: NamedLambdaVariable) => body match {
        case n: NamedLambdaVariable => n.exprId == v.exprId
        case _ => false
      }
      case _ => false
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
          // zero-divisor behavior comes from the MATCHED Divide's own
          // evalMode (frozen at its analysis), NOT from the session conf at
          // optimization time: a try_divide (TRY) or LEGACY cosine must
          // yield NULL on zero norms, only an ANSI Divide throws — reading
          // the conf here would both break try_divide and mis-fuse plans
          // whose ansi setting changed between construction and execution.
          // MUST be the `evalMode` ACCESSOR: Divide's third positional
          // field on Spark 4.1 is a NumericEvalContext wrapper, so the
          // bound pattern variable never equals EvalMode.ANSI — the latent
          // always-false compare silently degraded every fused ANSI cosine
          // to NULL-on-zero-norm (caught by ExtensionsSpec the round the
          // extensions became the default session shape)
          CosineSimilarity(a, b, failOnError = d.evalMode == EvalMode.ANSI)
        case _ => d
      }
  }
}
