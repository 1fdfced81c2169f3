package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Squared L2 norm of a numeric array — the unary specialization of
  * `dot_product(a, a)`: one array load per element instead of two.
  * Accumulation is the same ascending-index double fold as DotProduct, so
  * `SelfDotToNormSq` can substitute it bit-for-bit.
  */
case class NormSq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"norm_sq expects array<float|double>, got $other")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isF = elemIsFloat
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.$get($i);
         |  $s += x * x;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "norm_sq"
}

/** Optimizer rule: `dot_product(a, a)` → `norm_sq(a)` when both sides are
  * the same deterministic expression. A self-dot-product reads every array
  * element twice; the unary form reads it once — on a 1536-d float column
  * that halves the memory traffic of norm computations in scans. The
  * substitution is numerically exact (identical fold order), so it is safe
  * under the oracle hash-compare.
  *
  * The engine's example of `Rule[LogicalPlan]` Catalyst extension — the
  * remaining custom-extension kinds (Expression, Generator, Aggregator,
  * LogicalPlan+Strategy+SparkPlan) are covered elsewhere (SURVEY.md §8).
  */
object SelfDotToNormSq extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(l, r)
          if l.deterministic && l.canonicalized == r.canonicalized => NormSq(l)
    }
}
