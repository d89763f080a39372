package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Optimizer rule: rewrite the higher-order-function dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)
  *
  * into the codegen'd [[DotProductDouble]] native expression (~6× measured
  * on the 12.5M-pair near-dup join). Fires only for array<double> inputs;
  * assumes dense (no-null-element) vectors — the embedding-column contract —
  * since the HOF form would return NULL on a null element while the native
  * loop reads the primitive slot.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isMultiplyLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      x.exprId == a.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_ => true) {
      case agg @ ArrayAggregate(ZipWith(a, b, mul), Literal(0.0, DoubleType), merge, finish)
          if isMultiplyLambda(mul) && isSumLambda(merge) && isIdentityLambda(finish) &&
            isDoubleArray(a) && isDoubleArray(b) && agg.resolved =>
        DotProductDouble(a, b)
    }
}

/** Optimizer rule: rewrite the built-in set-similarity idioms over
  * string arrays into the one-pass codegen'd kernels —
  *
  *   size(array_intersect(a, b)) / size(array_union(a, b))
  *     → [[DistinctSetJaccard]](a, b)          (casts on either side ok)
  *   size(array_intersect(a, b))
  *     → [[DistinctSetOverlap]](a, b)          (anywhere it appears)
  *
  * Sound for ARBITRARY array<string> inputs (duplicates and null
  * elements included): the kernels compute the distinct-set semantics
  * the built-ins define, without materializing the two intermediate
  * arrays per row (TextKernels scaladoc; DistinctSetJaccardSpec pins
  * equality). The union side of the division accepts the operand pair
  * in either order — both built-ins are symmetric in SIZE. The one
  * edge is division of 0 by 0 (two empty arrays): the rewrite carries
  * the matched Divide's eval mode into the kernel's `failOnError`, so
  * an ANSI division keeps raising DIVIDE_BY_ZERO and legacy division /
  * try_divide keep producing NULL — value-exact in EVERY mode, which
  * matters because this rule is installed session-wide and ANY user
  * SQL using the idiom must keep the built-in contract (Spark 4
  * defaults `spark.sql.ansi.enabled=true`, so the engine's own
  * operators run the raising variant; their filtered shingle tables
  * never produce the 0/0 row). */
object RewriteSetSimilarity extends Rule[LogicalPlan] {

  private def stripCasts(e: Expression): Expression = e match {
    case c: Cast => stripCasts(c.child)
    case other => other
  }

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private def samePair(a1: Expression, b1: Expression,
                       a2: Expression, b2: Expression): Boolean =
    (a1.semanticEquals(a2) && b1.semanticEquals(b2)) ||
      (a1.semanticEquals(b2) && b1.semanticEquals(a2))

  // legacySizeOfNull=false only: under the legacy conf size(null) is -1
  // while the kernels return null — the rewrite must not change that
  private object SizeOfIntersect {
    def unapply(e: Expression): Option[(Expression, Expression)] =
      stripCasts(e) match {
        case Size(ArrayIntersect(a, b), false)
            if isStringArray(a) && isStringArray(b) => Some((a, b))
        case _ => None
      }
  }

  private object SizeOfUnion {
    def unapply(e: Expression): Option[(Expression, Expression)] =
      stripCasts(e) match {
        case Size(ArrayUnion(a, b), false) => Some((a, b))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_ => true) {
      // full Jaccard idiom first (transformDown visits Divide before its
      // Size children, so the standalone-overlap case can't shadow it);
      // the Divide's eval mode rides along so ANSI 0/0 keeps raising
      case d @ Divide(SizeOfIntersect(a, b), SizeOfUnion(a2, b2), _)
          if d.resolved && d.dataType == DoubleType && samePair(a, b, a2, b2) =>
        DistinctSetJaccard(a, b,
          failOnError = d.evalContext.evalMode == EvalMode.ANSI)
      case s @ Size(ArrayIntersect(a, b), false)
          if s.resolved && isStringArray(a) && isStringArray(b) =>
        DistinctSetOverlap(a, b)
    }
}

/** Session extensions: the optimizer rules above plus SQL registration of
  * the native kernels — install with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (done by
  * [[graft.GraftSession]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
    e.injectOptimizerRule(_ => RewriteSetSimilarity)
    e.injectFunction((
      FunctionIdentifier("dot_product_double"),
      new ExpressionInfo(classOf[DotProductDouble].getName, "dot_product_double"),
      (exprs: Seq[Expression]) => DotProductDouble(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("distinct_set_jaccard"),
      new ExpressionInfo(classOf[DistinctSetJaccard].getName, "distinct_set_jaccard"),
      (exprs: Seq[Expression]) => DistinctSetJaccard(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("distinct_set_overlap"),
      new ExpressionInfo(classOf[DistinctSetOverlap].getName, "distinct_set_overlap"),
      (exprs: Seq[Expression]) => DistinctSetOverlap(exprs(0), exprs(1))))
  }
}
