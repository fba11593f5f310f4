package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: recognize the idiomatic higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v)
  *
  * and replace it with the codegen'd [[DotProduct]] kernel. The HOF form
  * is what users naturally write; it evaluates a lambda frame per
  * element and resists whole-stage codegen. The kernel is a tight
  * primitive loop with identical ascending-index summation, so the
  * rewrite is value-preserving bit-for-bit — including the NULL edges:
  * [[DotProduct]] returns NULL on length mismatch and on NULL elements,
  * exactly as zip_with's null-padding + the null-propagating fold do,
  * so the rule is safe on arbitrary user arrays (containsNull=true
  * included). Registered via `GraftExtensions` (`injectOptimizerRule`).
  */
object DotRewrite extends Rule[LogicalPlan] {

  private object MulLambda {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                          Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _) =>
        (x.exprId == ax.exprId && y.exprId == ay.exprId) ||
          (x.exprId == ay.exprId && y.exprId == ax.exprId)
      case _ => false
    }
  }

  private object SumLambda {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(Add(s: NamedLambdaVariable, v: NamedLambdaVariable, _),
                          Seq(as: NamedLambdaVariable, av: NamedLambdaVariable), _) =>
        (s.exprId == as.exprId && v.exprId == av.exprId) ||
          (s.exprId == av.exprId && v.exprId == as.exprId)
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(r: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        r.exprId == a.exprId
      case _ => false
    }
  }

  private def isDoubleArray(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, mul @ MulLambda()),
        Literal(0.0, DoubleType),
        merge @ SumLambda(),
        finish @ IdentityFinish())
      if isDoubleArray(a.dataType) && isDoubleArray(b.dataType) =>
      DotProduct(a, b)
  }
}
