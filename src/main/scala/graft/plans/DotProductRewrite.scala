package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.expressions.DotProduct

/** Optimizer rule: rewrite the naive higher-order-function dot product
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  *
  * into the native codegen'd [[graft.expressions.DotProduct]]. The HOF
  * formulation is what users naturally write in SQL; it allocates an
  * intermediate array per row and interprets two lambdas per element
  * outside whole-stage codegen — on a per-pair similarity path that is
  * the dominant cost (see `operators/Similarity`). With this rule
  * injected (via [[graft.GraftExtensions]]), the naive spelling compiles
  * to the same tight primitive loop as the explicit
  * `VectorFunctions.dot` call.
  *
  * Contract (why the rewrite is safe on the embedding path, and when it
  * is not): both sides must be `array<double>`. For equal-length arrays
  * with non-null elements — the embedding-column contract everywhere in
  * graft — the two forms are value-identical, including IEEE summation
  * order. They differ only for ragged pairs (zip_with pads the shorter
  * side with null, so the HOF yields NULL; DotProduct stops at the
  * shorter length) — a malformed input for fixed-dimension vectors.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The two lambda variables, in either order (the ops commute). */
  private def usesBoth(l: Expression, r: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (l.semanticEquals(a) && r.semanticEquals(b)) ||
      (l.semanticEquals(b) && r.semanticEquals(a))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(ml, mr, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
          if isDoubleArray(a) && isDoubleArray(b) &&
            usesBoth(ml, mr, x, y) && usesBoth(al, ar, acc, v) &&
            fin.exprId == finArg.exprId =>
        DotProduct(a, b)
    }
}
